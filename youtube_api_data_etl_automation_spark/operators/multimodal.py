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

The real image/audio decoders are not installed in this environment, so
``decode_image`` is an explicit stub (NotImplementedError) and
``fake_decode_features`` is the deterministic stand-in that keeps the
pipeline (schema, batching, UDF signature) real and testable end-to-end.
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
            payloads = pdf["payload"]
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
                n = len(payload)
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
                n = len(payload)
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


def decode_image(blobs: DataFrame) -> DataFrame:
    """Real image decode (resize / pixel stats) — requires an image library
    that is not installed in this environment. Explicit stub per the build
    contract; ``fake_decode_features`` exercises the identical plumbing."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "use fake_decode_features() for pipeline testing"
    )


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
