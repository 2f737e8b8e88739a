"""Multimodal column processing (north-star op): opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched Pandas functions.

Design (per the 100 TB posture):
- payloads travel as ``BinaryType`` columns next to a metadata struct
  (mime type, byte length) so planners can prune/filter on metadata without
  touching bytes;
- compute over payloads is ``mapInPandas`` — Arrow batches, zero
  row-at-a-time Python, output schema declared up front so Catalyst can
  plan around the black box;
- partitioning: payload tables should be partitioned/bucketed by the id the
  downstream join uses; nothing here ever collects to the driver.

No codec libraries are installed in this environment, so the decoders are
split honestly: ``decode_image`` REALLY decodes the formats that need no
codec library (24-bit BMP, binary P6 PPM, non-interlaced 8-bit PNG via
stdlib zlib + scanline unfilter, and — r9 — baseline Huffman JPEG via
operators/jpeg.py), ``decode_audio`` really decodes
RIFF/WAVE PCM (8- and 16-bit), and every remaining compressed format
(progressive JPEG/GIF/WebP/MP3/AAC/...) raises an explicit NotImplementedError from inside
the same mapInPandas shape — or becomes a quarantine ROW under
``errors='quarantine'``. ``fake_decode_features`` remains the
deterministic stand-in for pipeline tests that don't care about pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, first_byte int, last_byte int"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int"


def attach_binary(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model documents as multimodal rows: opaque binary payload + metadata
    struct. (Here the payload is the utf-8 encoded text; in production it is
    image/audio/video bytes ingested as-is.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return docs.select(F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("meta"))


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    Features are deliberately deterministic (length, boundary bytes) so the
    Spark-side plumbing is oracle-checkable; a real pipeline swaps the inner
    function for image EXIF / audio duration / etc.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload (a NULL source column) reads as empty bytes —
            # len(None) used to kill the whole job on one bad row (r6
            # review); an empty payload already has defined features.
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                }
            )

    return blobs.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(blobs: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """Fixed-stride frame sampling of a binary payload (the video-frame /
    audio-chunk access pattern): one output row per frame with its length.
    mapInPandas keeps the fan-out inside the partition — no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(min(frame_bytes, n - i * frame_bytes))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return blobs.mapInPandas(batches, FRAME_SCHEMA)


FRAME_FEATURES_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_len int, first_byte int, last_byte int"
)


def frame_features(blobs: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling + per-frame feature extraction fused in ONE
    mapInPandas pass (the video pipeline shape: chunk, then featurize each
    chunk without a second payload scan). Output row per frame with its
    length and boundary bytes; fan-out stays inside the partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, firsts, lasts = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payload -> zero frames, like an empty payload (r6)
                n = len(payload) if payload is not None else 0
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for i in range(n_frames):
                    lo = i * frame_bytes
                    ln = min(frame_bytes, n - lo)
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(ln)
                    firsts.append(payload[lo])
                    lasts.append(payload[lo + ln - 1])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "first_byte": pd.Series(firsts, dtype="int32"),
                    "last_byte": pd.Series(lasts, dtype="int32"),
                }
            )

    return blobs.mapInPandas(batches, FRAME_FEATURES_SCHEMA)


DECODE_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


# Cumulative per-image budget of Average/Paeth-filtered bytes (the two
# filters whose reconstruction is an inherent byte recurrence and runs a
# plain-Python loop at ~0.3 µs/byte). 2 MB ≈ 0.7 s worst-case Python per
# image inside the Arrow batch — bounded enough for bulk thumbnail/tile
# corpora, and any hi-res Paeth-heavy image beyond it raises
# NotImplementedError (error_kind='unsupported' under errors='quarantine',
# so the refusal is recoverable row-level data, never a hung executor).
# Pass slow_filter_budget=None to decode_image for unlimited (correctness
# over latency), or a smaller budget for stricter per-image latency SLOs.
# At 100 TB, route hi-res imagery through a codec library on the executors
# and keep this stdlib path for environments without one.
PNG_SLOW_FILTER_BYTE_BUDGET = 2_000_000


def _png_unfilter(raw: bytes, h: int, w: int, ch: int,
                  slow_filter_budget: int | None = PNG_SLOW_FILTER_BYTE_BUDGET):
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)
    over the zlib-decompressed byte stream — the only part of PNG decode
    that needs per-pixel recurrence (each byte's predictor references the
    reconstructed left/up/up-left bytes). None/Up rows are whole-row numpy
    ops; Sub rows vectorize exactly as a per-channel-lane prefix sum mod
    256 (uint8 cumsum wraps, which IS the spec's mod-256); Average/Paeth
    are true recurrences (rec[x] needs rec[x-ch]) and run a plain-Python
    byte loop over list ints, capped by ``slow_filter_budget`` (see
    PNG_SLOW_FILTER_BYTE_BUDGET above).

    Why no numpy recurrence: the mod-256 + floor/branch nonlinearity
    kills every exact vectorization. A per-pixel numpy loop over
    ch-length lanes trades ~0.3 µs/byte of Python ints for ~15 µs/pixel
    of numpy call overhead (measured slower for ch≤4); the speculative
    256-carry parallel-scan pays a flat 256× element blow-up (w·ch·256
    lane-steps regardless of chunking), also slower. The loop below IS
    the fast exact pure-Python path — the budget bounds it instead."""
    import numpy as np

    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"malformed PNG: decompressed stream is {len(raw)} bytes, "
            f"expected {h * (stride + 1)} for {w}x{h}x{ch}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    pos = 0
    slow_bytes = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos)
        pos += stride
        prior = out[y - 1] if y > 0 else zero_row
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up — whole-row add, uint8 wraps mod 256
            out[y] = line + prior
        elif ft == 1:  # Sub — per-lane prefix sum; uint8 cumsum ≡ mod 256
            out[y] = np.cumsum(
                line.reshape(w, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ft in (3, 4):  # Average / Paeth — inherent byte recurrence
            slow_bytes += stride
            if slow_filter_budget is not None and \
                    slow_bytes > slow_filter_budget:
                raise NotImplementedError(
                    f"PNG exceeds the Average/Paeth byte budget "
                    f"({slow_bytes} > {slow_filter_budget}): hi-res "
                    "slow-filter images need a codec library; raise "
                    "slow_filter_budget (or pass None) to force the "
                    "pure-Python path"
                )
            lv = line.tolist()
            pv = prior.tolist()
            rec = [0] * stride
            if ft == 3:
                # first pixel: a = 0 → pred = pv>>1 (loop below then
                # never branches on x >= ch)
                for x in range(ch):
                    rec[x] = (lv[x] + (pv[x] >> 1)) & 0xFF
                for x in range(ch, stride):
                    rec[x] = (lv[x] + ((rec[x - ch] + pv[x]) >> 1)) & 0xFF
            else:
                # first pixel: a = c = 0 → Paeth predictor reduces to b
                for x in range(ch):
                    rec[x] = (lv[x] + pv[x]) & 0xFF
                for x in range(ch, stride):
                    a = rec[x - ch]
                    b = pv[x]
                    c = pv[x - ch]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (lv[x] + pred) & 0xFF
            out[y] = rec
        else:
            raise ValueError(f"malformed PNG: unknown filter type {ft}")
    return out


def _decode_png(payload: bytes,
                slow_filter_budget: int | None = PNG_SLOW_FILTER_BYTE_BUDGET):
    """Pure-stdlib PNG decode (zlib inflate + scanline unfilter) for the
    subset a codec-free decoder can honestly do: non-interlaced 8-bit
    greyscale (0), truecolor RGB (2), and RGBA (6). Palette, 16-bit, and
    Adam7-interlaced images raise NotImplementedError; structurally
    broken files raise ValueError (refuse-rather-than-misreport).
    Returns an HxWx3 RGB array; alpha is reported structure, not
    composited — the mean-channel features are over the stored RGB."""
    import struct
    import zlib

    import numpy as np

    ihdr = None
    idat = bytearray()
    pos = 8  # past the signature
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(
                f"malformed PNG: chunk {ctype!r} declares {length} bytes "
                f"but only {len(body)} remain (truncated payload)"
            )
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc (crc not checked)
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("malformed PNG: missing/short IHDR chunk")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w == 0 or h == 0:
        raise ValueError(f"malformed PNG: zero dimension ({w}x{h})")
    if comp != 0 or filt != 0:
        raise ValueError(
            f"malformed PNG: compression={comp}, filter_method={filt}"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth}, color_type={color}, "
            f"interlace={interlace}); only non-interlaced 8-bit "
            "greyscale/RGB/RGBA decodes without a codec library"
        )
    if not idat:
        raise ValueError("malformed PNG: no IDAT data")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"malformed PNG: IDAT inflate failed ({e})") from None
    px = _png_unfilter(
        raw, h, w, channels, slow_filter_budget=slow_filter_budget
    ).reshape(h, w, channels)
    if color == 0:
        px = np.repeat(px, 3, axis=2)
    elif color == 6:
        px = px[:, :, :3]
    return px


def _decode_rgb(payload: bytes,
                slow_filter_budget: int | None = PNG_SLOW_FILTER_BYTE_BUDGET):
    """Decode one image payload to (format, HxWx3 RGB array).

    Pure stdlib+numpy decoders for the formats that need no codec
    library:
    - BMP: 24-bit BI_RGB (BITMAPINFOHEADER), bottom-up or top-down rows,
      4-byte row padding, BGR channel order.
    - PPM: binary P6, maxval ≤ 255, '#' header comments.
    - PNG (r7): non-interlaced 8-bit greyscale/RGB/RGBA via stdlib zlib +
      spec scanline unfilter — the format a web corpus actually contains.
    - JPEG (r9): baseline/extended-sequential Huffman via
      operators/jpeg.py (T.81 marker parse, canonical Huffman entropy
      decode, float64 IDCT, chroma upsampling, BT.601) — the DOMINANT
      web-corpus format, previously 100% quarantine.

    Progressive JPEG / palette / interlaced / 16-bit images still raise
    NotImplementedError — those need a real codec library, absent in
    this environment."""
    import struct

    import numpy as np

    if not payload:
        raise ValueError("empty/NULL image payload")
    if payload[:2] == b"BM":
        off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP variant not supported (bpp={bpp}, compression={comp}); "
                "only 24-bit BI_RGB decodes without a codec library"
            )
        top_down, hh = h < 0, abs(h)
        stride = (w * 3 + 3) & ~3
        arr = np.frombuffer(
            payload, dtype=np.uint8, count=stride * hh, offset=off
        ).reshape(hh, stride)[:, : w * 3].reshape(hh, w, 3)
        rgb = arr[:, :, ::-1]  # BGR → RGB
        return "bmp", (rgb if top_down else rgb[::-1])
    if payload[:2] == b"P6":
        i, vals = 2, []
        while len(vals) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace byte after maxval
        w, h, maxval = vals
        if maxval > 255:
            raise NotImplementedError(
                "16-bit PPM (maxval > 255) not supported"
            )
        rgb = np.frombuffer(
            payload, dtype=np.uint8, count=w * h * 3, offset=i
        ).reshape(h, w, 3)
        return "ppm", rgb
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png", _decode_png(
            payload, slow_filter_budget=slow_filter_budget
        )
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_baseline_jpeg

        return "jpeg", decode_baseline_jpeg(payload)
    raise NotImplementedError(
        "compressed/unknown image format (magic "
        f"{payload[:2]!r}) requires PIL/opencv, not available in this "
        "container; use fake_decode_features() for pipeline testing"
    )


DECODE_QUARANTINE_SCHEMA = DECODE_SCHEMA + ", error string, error_kind string"


def _error_kind(e: Exception) -> str:
    """Route quarantined decode failures by exception class, so consumers
    can split the two populations without parsing message text:
    'unsupported' (NotImplementedError — a real codec library would decode
    it; re-route those payloads to an executor image with PIL/ffmpeg) vs
    'corrupt' (ValueError — structurally broken blob; no library will
    help, drop or re-fetch at the source)."""
    return "unsupported" if isinstance(e, NotImplementedError) else "corrupt"


def _check_errors_mode(errors: str) -> bool:
    if errors not in ("raise", "quarantine"):
        raise ValueError(
            f"errors must be 'raise' or 'quarantine', got {errors!r}"
        )
    return errors == "quarantine"


def decode_image(
    blobs: DataFrame,
    errors: str = "raise",
    slow_filter_budget: int | None = PNG_SLOW_FILTER_BYTE_BUDGET,
) -> DataFrame:
    """REAL image decode for codec-free formats (24-bit BMP, binary P6
    PPM, and — r7 — non-interlaced 8-bit greyscale/RGB/RGBA PNG via
    stdlib zlib + scanline unfilter) — struct parsing + numpy pixel math
    inside the same Arrow-batched mapInPandas shape as every other
    payload op. Output row per image: format, dimensions, per-channel
    means (exact doubles). Progressive JPEG and exotic PNG variants still raise
    NotImplementedError from the decoder (honest stub: a codec library
    is required and absent here).

    ``errors='quarantine'`` (r7, the repo's corrupt-input posture at
    batch scale — one bad blob in 100 TB must not kill the job): decode
    failures become ROWS instead of task failures; the schema gains an
    ``error`` column (NULL on success, the decode error's message on
    failure, feature columns NULL) so callers split with
    ``filter(col('error').isNull())`` — the same quarantine split as
    operators/quarantine.py, attributed by the decoder's own message —
    plus an ``error_kind`` column ('unsupported' vs 'corrupt', see
    :func:`_error_kind`) so the two failure populations route differently
    (progressive JPEG and GIF are 'unsupported', not broken; baseline
    JPEG — the dominant web-corpus case — really decodes since r9)."""
    quarantine = _check_errors_mode(errors)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fmts, ws, hs = [], [], [], []
            mr, mg, mb, errs, kinds = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    fmt, rgb = _decode_rgb(
                        bytes(payload) if payload is not None else b"",
                        slow_filter_budget=slow_filter_budget,
                    )
                except (ValueError, NotImplementedError) as e:
                    if not quarantine:
                        raise
                    ids.append(doc_id)
                    fmts.append(None)
                    hs.append(None)
                    ws.append(None)
                    mr.append(None)
                    mg.append(None)
                    mb.append(None)
                    errs.append(str(e))
                    kinds.append(_error_kind(e))
                    continue
                ids.append(doc_id)
                fmts.append(fmt)
                hs.append(rgb.shape[0])
                ws.append(rgb.shape[1])
                means = rgb.reshape(-1, 3).mean(axis=0, dtype="float64")
                mr.append(float(means[0]))
                mg.append(float(means[1]))
                mb.append(float(means[2]))
                errs.append(None)
                kinds.append(None)
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "format": pd.Series(fmts, dtype="object"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "mean_r": pd.array(mr, dtype="Float64"),
                "mean_g": pd.array(mg, dtype="Float64"),
                "mean_b": pd.array(mb, dtype="Float64"),
            }
            if quarantine:
                out["error"] = pd.Series(errs, dtype="object")
                out["error_kind"] = pd.Series(kinds, dtype="object")
            yield pd.DataFrame(out)

    schema = DECODE_QUARANTINE_SCHEMA if quarantine else DECODE_SCHEMA
    return blobs.mapInPandas(batches, schema)


AUDIO_SCHEMA = (
    "doc_id bigint, format string, sample_rate int, n_channels int, "
    "n_frames bigint, duration_sec double, peak int, rms double"
)


def _decode_pcm(payload: bytes):
    """Decode one RIFF/WAVE PCM payload to (sample_rate, int samples array
    shaped (frames, channels)).

    Manual chunk walk (not the stdlib ``wave`` module: it chokes on
    benign extension chunks and non-seekable layouts): 4-byte id + LE
    u32 size per chunk, even-padded; 'fmt ' gives the codec/layout,
    'data' the samples. Supported: format 1 (integer PCM) at 8-bit
    unsigned or 16-bit signed — everything a codec-free decoder can do.
    Float PCM, ADPCM, 24-bit, MP3-in-WAV raise NotImplementedError."""
    import struct

    import numpy as np

    if not payload:
        # Distinct from the unknown-codec case: a NULL/empty blob is a
        # data-quality problem (quarantine it), not a missing library.
        raise ValueError("empty/NULL audio payload")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed/unknown audio format (magic "
            f"{payload[:4]!r}) requires an audio codec library, not "
            "available in this container"
        )
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            # Truncated-in-transit file: refusing beats reporting
            # plausible level stats over a fragment (the module's
            # decode-faithfully-or-raise posture).
            raise ValueError(
                f"malformed WAVE: chunk {cid!r} declares {size} bytes but "
                f"only {len(payload) - pos - 8} remain (truncated payload)"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if fmt is not None:
                # A duplicate would silently shadow the first chunk and
                # report stats over a fragment — refuse instead (the
                # module's decode-faithfully-or-raise posture).
                raise ValueError("malformed WAVE: duplicate 'fmt ' chunk")
            fmt = body
        elif cid == b"data":
            if data is not None:
                raise ValueError("malformed WAVE: duplicate 'data' chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("malformed WAVE: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"malformed WAVE: fmt chunk is {len(fmt)} bytes (<16)")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if rate == 0:
        raise ValueError("malformed WAVE: sample_rate=0")
    # 0xFFFE = WAVE_FORMAT_EXTENSIBLE: real codec is the GUID's first
    # two bytes at offset 24 of the fmt body
    if audio_fmt == 0xFFFE and len(fmt) >= 26:
        audio_fmt = struct.unpack_from("<H", fmt, 24)[0]
    if audio_fmt != 1 or bits not in (8, 16) or n_ch == 0:
        raise NotImplementedError(
            f"WAVE variant not supported (format={audio_fmt}, bits={bits}, "
            f"channels={n_ch}); only integer PCM at 8/16-bit decodes "
            "without a codec library"
        )
    width = bits // 8
    n_frames = len(data) // (width * n_ch)
    if bits == 8:  # 8-bit WAV is unsigned, centered at 128
        samples = (
            np.frombuffer(data, dtype=np.uint8, count=n_frames * n_ch)
            .astype(np.int64) - 128
        )
    else:
        samples = np.frombuffer(
            data, dtype="<i2", count=n_frames * n_ch
        ).astype(np.int64)
    return int(rate), samples.reshape(n_frames, n_ch)


AUDIO_QUARANTINE_SCHEMA = AUDIO_SCHEMA + ", error string, error_kind string"


def decode_audio(blobs: DataFrame, errors: str = "raise") -> DataFrame:
    """REAL audio decode for RIFF/WAVE integer PCM — stdlib struct chunk
    walk + numpy sample math in the same Arrow-batched mapInPandas shape
    as ``decode_image``. Output row per payload: layout (rate, channels,
    frames, duration) and level stats — peak |sample| and RMS, both over
    all channels, computed with exact int64 sums so the doubles are
    deterministic. Compressed codecs raise NotImplementedError (honest
    stub: a codec library is required and absent here).

    ``errors='quarantine'``: decode failures become rows with ``error``
    and ``error_kind`` columns instead of task failures — see
    :func:`decode_image`."""
    import math

    quarantine = _check_errors_mode(errors)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols = {
                k: []
                for k in ("ids", "fmts", "rates", "chs", "frames", "durs",
                          "peaks", "rmss", "errs", "kinds")
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, s = _decode_pcm(
                        bytes(payload) if payload is not None else b""
                    )
                except (ValueError, NotImplementedError) as e:
                    if not quarantine:
                        raise
                    vals = (None, None, None, None, None, None, None,
                            str(e), _error_kind(e))
                else:
                    n = s.size
                    vals = (
                        "wav", rate, s.shape[1], s.shape[0],
                        s.shape[0] / rate,
                        int(abs(s).max()) if n else 0,
                        math.sqrt(int((s * s).sum()) / n) if n else 0.0,
                        None,
                        None,
                    )
                cols["ids"].append(doc_id)
                for k, v in zip(
                    ("fmts", "rates", "chs", "frames", "durs", "peaks",
                     "rmss", "errs", "kinds"),
                    vals,
                ):
                    cols[k].append(v)
            out = {
                "doc_id": pd.Series(cols["ids"], dtype="int64"),
                "format": pd.Series(cols["fmts"], dtype="object"),
                "sample_rate": pd.array(cols["rates"], dtype="Int32"),
                "n_channels": pd.array(cols["chs"], dtype="Int32"),
                "n_frames": pd.array(cols["frames"], dtype="Int64"),
                "duration_sec": pd.array(cols["durs"], dtype="Float64"),
                "peak": pd.array(cols["peaks"], dtype="Int32"),
                "rms": pd.array(cols["rmss"], dtype="Float64"),
            }
            if quarantine:
                out["error"] = pd.Series(cols["errs"], dtype="object")
                out["error_kind"] = pd.Series(cols["kinds"], dtype="object")
            yield pd.DataFrame(out)

    schema = AUDIO_QUARANTINE_SCHEMA if quarantine else AUDIO_SCHEMA
    return blobs.mapInPandas(batches, schema)


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """Deterministic stand-in for decode: derives fake width/height from the
    byte length. Same mapInPandas shape a real decoder would have."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n % 64 + 1).astype("int32"),
                    "height": (n % 48 + 1).astype("int32"),
                }
            )

    return blobs.mapInPandas(batches, "doc_id bigint, width int, height int")
