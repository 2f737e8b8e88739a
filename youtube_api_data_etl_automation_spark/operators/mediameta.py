"""Container-metadata extraction for multimodal payloads — no codecs.

The multimodal decode family (:mod:`.multimodal`) reconstructs pixels
and samples for the formats stdlib can honestly decode. For VIDEO — and
for triage over mixed image corpora — the 100 TB-relevant operation is
usually cheaper: read the CONTAINER metadata (duration, track layout,
codec fourcc, dimensions) without touching compressed essence at all.
That is pure struct parsing, which this module does for real:

- ``video_meta`` / ``_parse_mp4``: ISO-BMFF (MP4/MOV/M4A) box walk —
  ftyp brand, mvhd timescale/duration, one row-level summary of the
  traks (handler types via mdia/hdlr, visual dimensions via tkhd, codec
  fourccs via stbl/stsd). Handles 64-bit largesize boxes, version 0/1
  mvhd/tkhd, and nested box recursion with explicit bounds checks —
  truncated/overlapping boxes refuse with ValueError (quarantine
  'corrupt'), non-BMFF payloads (AVI/MKV/…) raise NotImplementedError
  ('unsupported': a demuxer library would read them).
- ``image_meta`` / ``_probe_image``: header-only dimension/format probe
  for PNG, JPEG (incl. progressive — SOF scan), GIF, BMP, PPM, and all
  three WebP flavors (VP8 key-frame size, VP8L 14-bit packed size, VP8X
  canvas size) — WebP PIXELS still need a codec library, but its
  dimensions do not, so corpus triage (resolution filters, aspect
  buckets, thumbnail routing) works over every common web format
  without decoding anything.

Both run as Arrow-batched ``mapInPandas`` with the same
``errors='quarantine'`` contract as the decoders: one bad payload in
10^12 is a row, not a task failure. Parsing cost is O(header bytes) per
payload — there is no budget knob because there is no per-pixel loop.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

VIDEO_META_SCHEMA = (
    "doc_id bigint, brand string, duration_sec double, n_tracks int, "
    "n_video_tracks int, n_audio_tracks int, width int, height int, "
    "codecs string"
)
VIDEO_META_QUARANTINE_SCHEMA = VIDEO_META_SCHEMA + \
    ", error string, error_kind string"

IMAGE_META_SCHEMA = (
    "doc_id bigint, format string, width int, height int"
)
IMAGE_META_QUARANTINE_SCHEMA = IMAGE_META_SCHEMA + \
    ", error string, error_kind string"

_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end);
    refuse on truncation/overlap rather than misreport."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(
                f"malformed MP4: truncated box header at offset {pos}"
            )
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(
                    f"malformed MP4: truncated largesize box at {pos}"
                )
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"malformed MP4: box {btype!r} at {pos} declares {size} "
                f"bytes beyond its scope"
            )
        yield btype, body, pos + size
        pos += size


def _parse_mp4(payload: bytes) -> dict:
    """One metadata summary dict for an ISO-BMFF payload (see module
    docstring for the fields)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError(
            "unknown video container (no ftyp box): AVI/MKV/raw streams "
            "need a demuxer library, not available in this container"
        )
    brand = payload[8:12].decode("latin-1")
    out = {
        "brand": brand, "duration_sec": None, "n_tracks": 0,
        "n_video_tracks": 0, "n_audio_tracks": 0,
        "width": None, "height": None, "codecs": [],
    }

    def walk_trak(body_start, body_end):
        out["n_tracks"] += 1
        t_w = t_h = None
        handler = None
        for btype, b0, b1 in _boxes(payload, body_start, body_end):
            if btype == b"tkhd":
                # width/height are the LAST two 16.16 fields of tkhd;
                # _boxes guarantees b1 <= len(payload), so the read is
                # in-bounds whenever the body holds 8 bytes at all
                off = b1 - 8
                if off >= b0:
                    w_fx, h_fx = struct.unpack_from(">II", payload, off)
                    t_w, t_h = w_fx >> 16, h_fx >> 16
            elif btype == b"mdia":
                for mtype, m0, m1 in _boxes(payload, b0, b1):
                    if mtype == b"hdlr" and m1 - m0 >= 12:
                        handler = payload[m0 + 8 : m0 + 12]
                    elif mtype == b"minf":
                        for ntype, n0, n1 in _boxes(payload, m0, m1):
                            if ntype != b"stbl":
                                continue
                            for stype, s0, s1 in _boxes(payload, n0, n1):
                                if stype != b"stsd" or s1 - s0 < 16:
                                    continue
                                # full box header (4) + entry count (4),
                                # then the first sample entry's fourcc
                                out["codecs"].append(
                                    payload[s0 + 12 : s0 + 16]
                                    .decode("latin-1")
                                )
        if handler == b"vide":
            out["n_video_tracks"] += 1
            if t_w and t_h and out["width"] is None:
                out["width"], out["height"] = t_w, t_h
        elif handler == b"soun":
            out["n_audio_tracks"] += 1

    for btype, b0, b1 in _boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for mtype, m0, m1 in _boxes(payload, b0, b1):
            if mtype == b"mvhd":
                if m1 - m0 < 1:
                    raise ValueError("malformed MP4: empty mvhd body")
                version = payload[m0]
                # v1: 4 fullbox + 8+8 times + 4 scale + 8 dur = 32 bytes;
                # v0: 4 fullbox + 4+4 times + 4 scale + 4 dur = 20 bytes
                need = 32 if version == 1 else 20
                if m1 - m0 < need:
                    raise ValueError(
                        f"malformed MP4: truncated mvhd v{version} body "
                        f"({m1 - m0} < {need} bytes)"
                    )
                if version == 1:
                    scale, dur = struct.unpack_from(">IQ", payload, m0 + 20)
                else:
                    scale, dur = struct.unpack_from(">II", payload, m0 + 12)
                if scale == 0:
                    raise ValueError("malformed MP4: mvhd timescale=0")
                out["duration_sec"] = dur / scale
            elif mtype == b"trak":
                walk_trak(m0, m1)
    if out["duration_sec"] is None:
        raise ValueError("malformed MP4: no moov/mvhd box")
    out["codecs"] = ",".join(out["codecs"])
    return out


def _probe_image(payload: bytes) -> tuple[str, int, int]:
    """(format, width, height) from headers only — no pixel decode."""
    if not payload:
        raise ValueError("empty/NULL image payload")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24:
            raise ValueError("malformed PNG: truncated IHDR")
        w, h = struct.unpack_from(">II", payload, 16)
        return "png", w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("malformed GIF: truncated screen descriptor")
        w, h = struct.unpack_from("<HH", payload, 6)
        return "gif", w, h
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("malformed BMP: truncated header")
        w = struct.unpack_from("<i", payload, 18)[0]
        h = abs(struct.unpack_from("<i", payload, 22)[0])
        return "bmp", w, h
    if payload[:2] == b"P6":
        from .multimodal import _ppm_header  # O(header) — never pixels

        w, h, _maxval, _off = _ppm_header(payload)
        return "ppm", w, h
    if payload[:2] == b"\xff\xd8":
        # walk segments to the first SOF (any Huffman/arithmetic kind)
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                raise ValueError("malformed JPEG: expected marker")
            marker = payload[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 > n:
                    raise ValueError("malformed JPEG: truncated SOF")
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                return "jpeg", w, h
            pos += 2 + seg_len
        raise ValueError("malformed JPEG: no SOF marker")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        if len(payload) < 30:
            raise ValueError("malformed WebP: truncated chunk")
        kind = payload[12:16]
        if kind == b"VP8 ":  # lossy key frame: 14.16le sizes at +26
            w, h = struct.unpack_from("<HH", payload, 26)
            return "webp", (w & 0x3FFF), (h & 0x3FFF)
        if kind == b"VP8L":  # lossless: 14+14 bits packed after 0x2F
            if payload[20] != 0x2F:
                raise ValueError("malformed WebP: bad VP8L signature")
            bits = struct.unpack_from("<I", payload, 21)[0]
            return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if kind == b"VP8X":  # extended: 24-bit canvas minus one
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return "webp", w, h
        raise ValueError(f"malformed WebP: unknown chunk {kind!r}")
    raise NotImplementedError(
        f"unknown image format (magic {payload[:2]!r}); header probing "
        "covers PNG/JPEG/GIF/BMP/PPM/WebP"
    )


def _quarantine_batches(rows_fn, columns, quarantine):
    """Shared mapInPandas body: rows_fn(payload) -> dict of columns, or
    raises; failures become quarantine rows when enabled."""
    from .multimodal import DECODE_ERRORS, _error_kind

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols: dict[str, list] = {c: [] for c in ("doc_id", *columns)}
            if quarantine:
                cols["error"] = []
                cols["error_kind"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                cols["doc_id"].append(doc_id)
                try:
                    vals = rows_fn(
                        bytes(payload) if payload is not None else b""
                    )
                except DECODE_ERRORS as e:
                    if not quarantine:
                        raise
                    for c in columns:
                        cols[c].append(None)
                    cols["error"].append(str(e))
                    cols["error_kind"].append(_error_kind(e))
                    continue
                for c in columns:
                    cols[c].append(vals[c])
                if quarantine:
                    cols["error"].append(None)
                    cols["error_kind"].append(None)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in cols.items()}
            )

    return batches


def video_meta(blobs: DataFrame, errors: str = "raise") -> DataFrame:
    """Container metadata per video payload (see module docstring):
    ``(doc_id, brand, duration_sec, n_tracks, n_video_tracks,
    n_audio_tracks, width, height, codecs)``."""
    from .multimodal import _check_errors_mode

    quarantine = _check_errors_mode(errors)

    def one(payload):
        if not payload:
            raise ValueError("empty/NULL video payload")
        return _parse_mp4(payload)

    schema = VIDEO_META_QUARANTINE_SCHEMA if quarantine else VIDEO_META_SCHEMA
    return blobs.mapInPandas(
        _quarantine_batches(
            one,
            ("brand", "duration_sec", "n_tracks", "n_video_tracks",
             "n_audio_tracks", "width", "height", "codecs"),
            quarantine,
        ),
        schema,
    )


def image_meta(blobs: DataFrame, errors: str = "raise") -> DataFrame:
    """Header-only ``(doc_id, format, width, height)`` per image payload
    — incl. WebP, whose pixels the decode family cannot produce."""
    from .multimodal import _check_errors_mode

    quarantine = _check_errors_mode(errors)

    def one(payload):
        fmt, w, h = _probe_image(payload)
        return {"format": fmt, "width": w, "height": h}

    schema = IMAGE_META_QUARANTINE_SCHEMA if quarantine else IMAGE_META_SCHEMA
    return blobs.mapInPandas(
        _quarantine_batches(one, ("format", "width", "height"), quarantine),
        schema,
    )
