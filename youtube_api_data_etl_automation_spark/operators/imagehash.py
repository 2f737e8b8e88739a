"""Perceptual image hashing + near-duplicate image pairs.

Bridges the decode surface (operators/multimodal.py, jpeg.py, gif.py,
vp8l.py, tiff.py — every format `decode_image` handles) into the dedup
ladder: re-encoded, resized, or slightly-retouched copies of the same
picture hash to nearby 64-bit codes, and near-pairs surface through the
same banding idiom as MinHash-LSH (operators/dedup.py) — NO all-pairs
comparison anywhere.

Hashes (classic public constructions):

- **dHash** (difference hash): grey luma → 9×8 exact area-average grid
  → bit[r,c] = grid[r,c] > grid[r,c+1]. Robust to re-encoding and
  uniform brightness shifts (it compares neighbors, not levels).
- **aHash** (average hash): 8×8 grid → bit = cell > global mean.

Both are pure byte math over the decoder's RGB output — deterministic
across machines (float64 means of exact integer pixels), so they are
golden-oracle material like every other decode fingerprint.

Near-dup pairs: split the 64-bit code into ``max_hamming + 1``
contiguous bands. Two codes within Hamming distance ``max_hamming``
agree EXACTLY on at least one band (pigeonhole), so candidate
generation is an equi-join on ``(band_idx, band_value)`` — shuffle
traffic is (rows × bands) small ints, never pixels — and a cheap
``bit_count(a XOR b) <= k`` verify filters the candidates. Same
recall-exactness argument as symmetric-delete fuzzy keys
(operators/fuzzy.py): the blocking is complete for the stated radius,
not approximate.

Scale: hashing is the usual Arrow-batched mapInPandas (embarrassingly
parallel, no shuffle); the pair join shuffles only (doc_id, band)
tuples. Band width 64/(k+1) ≥ 8 bits keeps bucket sizes near-uniform
on real corpora; a pathological bucket (e.g. millions of flat-color
thumbnails hashing to 0) is a data-skew signal the caller handles like
any hot LSH band — AQE skew-join splits it at runtime.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_HASH_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "dhash bigint, ahash bigint"
)
IMAGE_HASH_QUARANTINE_SCHEMA = (
    IMAGE_HASH_SCHEMA + ", error string, error_kind string"
)


def _area_average(grey: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-average resample of a 2-D float array to
    ``out_h × out_w``. Boxes are the contiguous integer partitions
    ``[floor(i·H/out_h), floor((i+1)·H/out_h))`` widened to at least one
    row/col (so images smaller than the grid repeat pixels rather than
    producing empty boxes). Deterministic float64 — no interpolation
    kernels, no library variance."""
    h, w = grey.shape
    out = np.empty((out_h, out_w), dtype=np.float64)
    rb = [(r * h) // out_h for r in range(out_h + 1)]
    cb = [(c * w) // out_w for c in range(out_w + 1)]
    for r in range(out_h):
        r0, r1 = rb[r], max(rb[r + 1], rb[r] + 1)
        r0 = min(r0, h - 1)
        for c in range(out_w):
            c0, c1 = cb[c], max(cb[c + 1], cb[c] + 1)
            c0 = min(c0, w - 1)
            out[r, c] = grey[r0:max(r1, r0 + 1), c0:max(c1, c0 + 1)].mean()
    return out


def _luma(rgb: np.ndarray) -> np.ndarray:
    # BT.601 — the same weighting the JPEG decoder's color path uses
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
            + 0.114 * rgb[..., 2]).astype(np.float64)


def _bits_to_i64(bits: np.ndarray) -> int:
    """Pack a flat boolean array (MSB first) into a SIGNED 64-bit int —
    the bigint Spark/DuckDB share (value wraps for bit 0 set)."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def dhash64(rgb: np.ndarray) -> int:
    grid = _area_average(_luma(rgb), 8, 9)
    return _bits_to_i64(grid[:, :-1] > grid[:, 1:])


def ahash64(rgb: np.ndarray) -> int:
    grid = _area_average(_luma(rgb), 8, 8)
    return _bits_to_i64(grid > grid.mean())


IMAGE_HASH_PIXEL_BUDGET = 4_000_000  # same default as triage


def image_hashes(blobs: DataFrame, errors: str = "raise",
                 max_pixels: int | None = IMAGE_HASH_PIXEL_BUDGET,
                 ) -> DataFrame:
    """Decode + hash in ONE pass over ``(doc_id, payload)``: per image
    the 64-bit dHash and aHash plus dimensions. Same quarantine
    contract as :func:`operators.multimodal.decode_image` (whose
    decoder this calls — every format it decodes, hashes).

    ``max_pixels``: probe-first budget (the triage_decode_images
    posture) — the header is read BEFORE any pixel decodes, so an
    oversized image costs O(header) and routes to
    ``error_kind='unsupported'`` instead of tying up an executor; pass
    None to hash everything."""
    from .mediameta import _probe_image
    from .multimodal import (
        DECODE_ERRORS, _check_errors_mode, _decode_rgb, _error_kind,
        _error_text,
    )

    quarantine = _check_errors_mode(errors)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fmts, ws, hs, dh, ah = [], [], [], [], [], []
            errs, kinds = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    raw = bytes(payload) if payload is not None else b""
                    if max_pixels is not None:
                        _, pw, ph = _probe_image(raw)
                        if pw * ph > max_pixels:
                            raise NotImplementedError(
                                f"image {pw}x{ph} exceeds the "
                                f"{max_pixels}-pixel hash budget; raise "
                                "max_pixels (or pass None) to force the "
                                "decode"
                            )
                    fmt, rgb = _decode_rgb(raw)
                    d, a = dhash64(rgb), ahash64(rgb)
                except DECODE_ERRORS as e:
                    if not quarantine:
                        raise
                    ids.append(doc_id)
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    dh.append(None)
                    ah.append(None)
                    errs.append(_error_text(e))
                    kinds.append(_error_kind(e))
                    continue
                ids.append(doc_id)
                fmts.append(fmt)
                hs.append(rgb.shape[0])
                ws.append(rgb.shape[1])
                dh.append(d)
                ah.append(a)
                errs.append(None)
                kinds.append(None)
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "format": pd.Series(fmts, dtype="object"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "dhash": pd.array(dh, dtype="Int64"),
                "ahash": pd.array(ah, dtype="Int64"),
            }
            if quarantine:
                out["error"] = pd.Series(errs, dtype="object")
                out["error_kind"] = pd.Series(kinds, dtype="object")
            yield pd.DataFrame(out)

    schema = IMAGE_HASH_QUARANTINE_SCHEMA if quarantine \
        else IMAGE_HASH_SCHEMA
    return blobs.mapInPandas(batches, schema)


THUMB_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "thumb_w int, thumb_h int, thumb binary"
)
THUMB_QUARANTINE_SCHEMA = THUMB_SCHEMA + ", error string, error_kind string"


def image_thumbnails(blobs: DataFrame, out_h: int = 8, out_w: int = 8,
                     errors: str = "raise",
                     max_pixels: int | None = IMAGE_HASH_PIXEL_BUDGET,
                     ) -> DataFrame:
    """Deterministic thumbnail extraction — the resize step of an image
    training pipeline: decode via the full format matrix, exact
    area-average to ``out_h × out_w`` (the same box partition the
    hashes use — float64 over exact integer pixels, no interpolation
    kernels, so the output bytes are bit-identical across machines),
    round half-up to uint8, and emit row-major RGB bytes
    (``out_h*out_w*3``). Probe-first pixel budget like
    :func:`image_hashes`; quarantine contract like every payload op.
    The thumbnail is the model-input proxy — downstream embedding or
    pHash-style stages consume it without re-decoding the original."""
    from .mediameta import _probe_image
    from .multimodal import (
        DECODE_ERRORS, _check_errors_mode, _decode_rgb, _error_kind,
        _error_text,
    )

    if not (1 <= out_h <= 256 and 1 <= out_w <= 256):
        raise ValueError(
            f"thumbnail grid must be within 256x256, got {out_w}x{out_h}"
        )
    quarantine = _check_errors_mode(errors)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fmts, ws, hs, thumbs = [], [], [], [], []
            errs, kinds = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    raw = bytes(payload) if payload is not None else b""
                    if max_pixels is not None:
                        _, pw, ph = _probe_image(raw)
                        if pw * ph > max_pixels:
                            raise NotImplementedError(
                                f"image {pw}x{ph} exceeds the "
                                f"{max_pixels}-pixel thumbnail budget; "
                                "raise max_pixels (or pass None)"
                            )
                    fmt, rgb = _decode_rgb(raw)
                    grid = np.stack(
                        [_area_average(rgb[..., c].astype(np.float64),
                                       out_h, out_w)
                         for c in range(3)], axis=-1)
                    thumb = np.floor(grid + 0.5).clip(0, 255) \
                        .astype(np.uint8).tobytes()
                except DECODE_ERRORS as e:
                    if not quarantine:
                        raise
                    ids.append(doc_id)
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    thumbs.append(None)
                    errs.append(_error_text(e))
                    kinds.append(_error_kind(e))
                    continue
                ids.append(doc_id)
                fmts.append(fmt)
                hs.append(rgb.shape[0])
                ws.append(rgb.shape[1])
                thumbs.append(bytearray(thumb))
                errs.append(None)
                kinds.append(None)
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "format": pd.Series(fmts, dtype="object"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "thumb_w": pd.Series([out_w] * len(ids), dtype="int32"),
                "thumb_h": pd.Series([out_h] * len(ids), dtype="int32"),
                "thumb": pd.Series(thumbs, dtype="object"),
            }
            if quarantine:
                out["error"] = pd.Series(errs, dtype="object")
                out["error_kind"] = pd.Series(kinds, dtype="object")
            yield pd.DataFrame(out)

    schema = THUMB_QUARANTINE_SCHEMA if quarantine else THUMB_SCHEMA
    return blobs.mapInPandas(batches, schema)


def hash_bands(df: DataFrame, hash_col: str, n_bands: int) -> DataFrame:
    """Explode each 64-bit hash into ``(doc_id, band_idx, band_val)``
    rows — contiguous bit slices, widths as equal as 64/n_bands allows
    (remainder spread over the leading bands). Pure Column math."""
    if not 1 <= n_bands <= 64:
        raise ValueError(f"n_bands must be in [1, 64], got {n_bands}")
    base, rem = divmod(64, n_bands)
    widths = [base + (1 if i < rem else 0) for i in range(n_bands)]
    shifts = []
    pos = 0
    for w in widths:
        shifts.append(64 - pos - w)
        pos += w
    def slice_col(w, s):
        col = F.shiftrightunsigned(F.col(hash_col), s)
        if w < 64:  # (1<<64)-1 overflows a Java long literal
            col = col.bitwiseAND(F.lit((1 << w) - 1))
        return col

    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band_idx"),
            slice_col(w, s).alias("band_val"),
        )
        for i, (w, s) in enumerate(zip(widths, shifts))
    ])
    return (
        df.select("doc_id", hash_col, F.explode(bands).alias("b"))
        .select("doc_id", hash_col,
                F.col("b.band_idx").alias("band_idx"),
                F.col("b.band_val").alias("band_val"))
    )


def near_dup_image_pairs(hashes: DataFrame, max_hamming: int = 4,
                         hash_col: str = "dhash") -> DataFrame:
    """All pairs within ``max_hamming`` bits on ``hash_col`` —
    EXACT recall via ``max_hamming + 1`` band blocking (two codes that
    differ in ≤ k bits must agree on one of k+1 disjoint bands), then a
    ``bit_count(XOR)`` verify. Returns ``(doc_id_a, doc_id_b,
    hamming)`` with ``doc_id_a < doc_id_b``, deduped across bands.

    Plan shape: one explode (no shuffle), one equi-join on the band key
    (the only shuffle — small int tuples), TakeOrdered-free aggregation;
    no cartesian/BNLJ anywhere."""
    if not 0 <= max_hamming <= 16:
        raise ValueError(
            f"max_hamming must be in [0, 16], got {max_hamming}"
        )
    n_bands = max_hamming + 1
    banded = hash_bands(
        hashes.filter(F.col(hash_col).isNotNull()), hash_col, n_bands)
    left = banded.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col(hash_col).alias("_ha"),
        "band_idx", "band_val",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col(hash_col).alias("_hb"),
        "band_idx", "band_val",
    )
    pairs = (
        left.join(right, on=["band_idx", "band_val"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a", "doc_id_b",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def dedup_images(blobs: DataFrame, max_hamming: int = 4,
                 hash_col: str = "dhash",
                 max_pixels: int | None = IMAGE_HASH_PIXEL_BUDGET,
                 ) -> dict:
    """The image near-dup pipeline in one composition — the multimodal
    twin of the text corpus's MinHash→CC→survivor ladder
    (corpus.curate_corpus's neardup stage):

    decode+hash (probe-budgeted, quarantine) → banded Hamming pairs
    (exact recall at the radius) → connected components (min-label
    clusters, operators/dedup.py) → survivors = every unclustered image
    plus each cluster's canonical (min-id) member.

    Returns ``{"survivors": DataFrame(doc_id, dhash, ahash, width,
    height), "clusters": DataFrame(doc_id, canonical_id), "quarantined":
    DataFrame(doc_id, error, error_kind), "audit": DataFrame(stage,
    n)}`` — the audit counts each stage so a curation report can show
    where images went. Plan: one decode pass, one band-key shuffle for
    pairs, diameter-bounded CC rounds; re-encoded copies of the same
    pixels collapse by construction (the hash sees pixels, not bytes)."""
    from .dedup import connected_components

    hashed = image_hashes(blobs, errors="quarantine",
                          max_pixels=max_pixels)
    good = hashed.filter(F.col("error").isNull()) \
        .select("doc_id", "dhash", "ahash", "width", "height")
    quarantined = hashed.filter(F.col("error").isNotNull()) \
        .select("doc_id", "error", "error_kind")
    pairs = near_dup_image_pairs(good, max_hamming=max_hamming,
                                 hash_col=hash_col)
    clusters = connected_components(pairs, a_col="doc_id_a",
                                    b_col="doc_id_b")
    survivors = (
        good.join(clusters, on="doc_id", how="left")
        .filter(F.col("canonical_id").isNull()
                | (F.col("canonical_id") == F.col("doc_id")))
        .select("doc_id", "dhash", "ahash", "width", "height")
    )
    def stage_count(df, name):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("stage"), "n")

    audit = (
        stage_count(blobs, "input")
        .unionByName(stage_count(good, "hashed"))
        .unionByName(stage_count(quarantined, "quarantined"))
        .unionByName(stage_count(pairs, "near_dup_pairs"))
        .unionByName(stage_count(survivors, "survivors"))
    )
    return {"survivors": survivors, "clusters": clusters,
            "quarantined": quarantined, "audit": audit}
