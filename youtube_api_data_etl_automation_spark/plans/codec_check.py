"""Golden-values verification of the codec/metadata surface.

The decode family (operators/multimodal.py, operators/jpeg.py,
operators/gif.py) and the container probes (operators/mediameta.py) are
pytest-pinned against independent in-repo encoders, but until r10 they
had no DRIVER-side correctness signal: the `multimodal_frame_features`
oracle only exercises the Arrow/mapInPandas plumbing over ASCII
payloads. This module closes that gap the same way
`reference_pipeline.py` does for the ETL: a committed fixture parquet of
encoder-built payloads covering the full decode matrix (PNG variants,
baseline + progressive JPEG, GIF, BMP, PPM, the WAV matrix incl. G.711 +
IMA/MS ADPCM, MP4 boxes, WebP headers, plus deliberate corrupt and
unsupported payloads), a query that decodes/probes every payload and
folds the result into a per-payload fingerprint row, and a generated
golden VALUES table (tools/make_codec_fixture.py) the DuckDB oracle
replays. Any regression in ~3k LoC of decoder code flips the driver's
hash match.

Fixture families → engine op exercised:
- ``image``       → :func:`operators.multimodal.decode_image`
- ``audio``       → :func:`operators.multimodal.decode_audio`
- ``image_meta``  → :func:`operators.mediameta.image_meta`
- ``video_meta``  → :func:`operators.mediameta.video_meta` (MP4 + MKV)
- ``audio_meta``  → :func:`operators.mediameta.audio_meta` (r10:
  MP3/FLAC/WAV header probes)
- ``image_exif``  → :func:`operators.mediameta.image_exif` (r10:
  JPEG APP1 TIFF walk)
- ``audio_tags``  → :func:`operators.mediameta.audio_tags` (r10:
  ID3v2 / VORBIS_COMMENT / LIST-INFO)
- ``video_frame`` → :func:`operators.mediameta.video_keyframe_features`
  (r11: AVI/MJPEG + GIF first-keyframe pixel features)
- ``audio_subband`` → :func:`operators.multimodal.audio_subband_features`
  (r11: MPEG-1 Layer I exact subband-domain essence statistics)
- ``archive``      → :func:`operators.archives.archive_meta`
  (r11: gzip/zip/tar/WARC container probe)
- ``warc_records`` → :func:`operators.archives.warc_records`
  (r11: per-record WARC split, folded to one fingerprint per payload)
- ``document``      → :func:`operators.pdf.pdf_text` (r11: full PDF
  text extraction — filters, ObjStm, ToUnicode CMaps, refusals)
- ``document_meta`` → :func:`operators.pdf.pdf_meta` (r11: structural
  probe, no decompression)
- ``image_hash``    → :func:`operators.imagehash.image_hashes` (r11:
  dHash/aHash perceptual codes over real decoded pixels — the
  image-near-dup dedup bridge; format-invariance pinned by the
  PNG-vs-BMP same-pixels payload pair)
- ``exif_strip``    → :func:`operators.mediameta.strip_exif` (r11:
  privacy scrub — removed-bytes + md5 of the cleaned payload)
- ``office``        → :func:`operators.archives.docx_text` (r11:
  OOXML .docx text extraction)
- ``image_thumb``   → :func:`operators.imagehash.image_thumbnails`
  (r11: deterministic 8×8 area-average resize, bytes fingerprinted)
- ``subtitle``      → :func:`operators.subtitles.subtitles_text`
  (r11: SRT/WebVTT caption extraction — the video-adjacent text)
- ``document_images`` → :func:`operators.pdf.pdf_images` (r12: image
  XObject extraction — DCTDecode passthrough JPEGs, Flate/Indexed
  PNM unpack, Form recursion, per-image refusal routing; per-document
  fold of every extracted payload's md5; r14: JBIG2 MMR decode +
  arithmetic refusal rows)
- ``image_pages`` → :func:`operators.tiff.tiff_page_images` (r14:
  multi-page TIFF per-page extraction — mixed per-page compressions,
  the corrupt-middle-page sibling-survival contract, container
  quarantine; per-document fold of every page payload's md5)
- ``office_pptx`` / ``office_xlsx`` → :func:`operators.archives.
  pptx_text` / :func:`~operators.archives.xlsx_text` (r14: DrawingML
  slide runs; shared-strings + typed cell walk — legacy OLE2
  refusals pinned alongside)
- ``office_odf`` → :func:`operators.archives.odf_text` (r14:
  OpenDocument odt/odp/ods content.xml walk — paragraphs/headings,
  tab/line-break/run-length spaces, mimetype kind detection)
- ``document_epub`` → :func:`operators.archives.epub_text` (r14:
  container → OPF spine → XHTML chapters → visible text; entity and
  whitespace normalization pinned)
- ``mail_eml`` → :func:`operators.mail.eml_text` (r14: MIME
  multipart walk — alternative-prefers-plain, RFC 2047 header
  decode, transfer-encoding/charset handling, attachment counting)
- ``document_rtf`` → :func:`operators.rtf.rtf_text` (r14: the RTF
  group/destination/escape walk — uN unicode words with ucN
  fallbacks, cp1252 hex escapes, destination skipping)
- ``document_latex`` → :func:`operators.latex.latex_text` (late r14:
  comment/math/environment dropping, accent composition, verbatim
  preservation; unterminated math and plain prose quarantine)
- ``document_ipynb`` → :func:`operators.notebooks.ipynb_text` (late
  r14: nbformat 4 cells + nbformat 3 worksheets flattened to
  markdown-plus-fenced-code; future nbformat refuses)
- ``document_markdown`` → :func:`operators.markdown.markdown_text`
  (late r14: CommonMark-lite flatten — fences raw, headings/quotes/
  lists/tables/inline passes; only the empty payload refuses)

Scale note: the fixture is a verification corpus (~40 rows, a few KB);
the ops it drives are the same Arrow-batched mapInPandas operators that
run over real payload tables, so the plan shape it certifies is the
100 TB plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weakref import WeakKeyDictionary

from ..functions.rounding import round6

# r14 construct-latency memo: the codec verification plan is a PURE
# function of (session, families) over the committed fixture parquet —
# 29 operator constructions + a 29-way union cost ~2.3 s of driver
# latency per build (guide §7.3: single-threaded plan construction).
# Only the lazy PLAN is cached (keyed weakly per live SparkSession, so
# a stopped session frees it); every force still re-reads the fixture
# and re-runs every decoder — results are never cached.
_CODEC_STATS_PLANS: WeakKeyDictionary = WeakKeyDictionary()

CODEC_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "codec_payloads.parquet",
)

# One schema for every family: fmt/width/height where the op yields them,
# everything else folded into the fp string (exact ints, %.6f floats —
# deterministic: the decoders are pure byte math).
CODEC_STATS_COLUMNS = ("doc_id", "fmt", "width", "height", "fp")


def _err_fp():
    return F.concat(F.lit("ERR:"), F.col("error_kind"))


CODEC_FAMILIES = (
    "image", "audio", "image_meta", "video_meta", "audio_meta",
    "image_exif", "audio_tags", "video_frame", "audio_subband",
    "archive", "warc_records", "document", "document_meta",
    "image_hash", "exif_strip", "office", "image_thumb", "subtitle",
    "document_images", "image_pages", "office_pptx", "office_xlsx",
    "office_odf", "document_epub", "mail_eml", "document_rtf",
    "document_latex", "document_ipynb", "document_markdown",
)


def codec_stats(spark: SparkSession,
                families: tuple[str, ...] | None = None) -> DataFrame:
    """One fingerprint row per fixture payload: ``(doc_id, fmt, width,
    height, fp)``. Quarantined payloads carry ``fp='ERR:<kind>'`` so the
    corrupt/unsupported routing is part of the golden contract too.

    ``families`` restricts the union to a subset of
    :data:`CODEC_FAMILIES` — bench.py times each family standalone so
    the 2x per-section policy can localize a regression inside the
    growing codec row (VERDICT r11 item 6); the driver oracle runs the
    full union."""
    from ..operators.mediameta import (
        audio_meta,
        audio_tags,
        image_exif,
        image_meta,
        strip_exif,
        video_keyframe_features,
        video_meta,
    )
    from ..operators.archives import archive_meta, docx_text, warc_records
    from ..operators.imagehash import image_hashes, image_thumbnails
    from ..operators.pdf import pdf_images, pdf_meta, pdf_text
    from ..operators.subtitles import subtitles_text
    from ..operators.multimodal import (
        audio_subband_features,
        decode_audio,
        decode_image,
    )
    from ..session import ship_package

    # the decode closures are pickled by module reference — workers must
    # be able to import the package no matter where the driver is rooted
    ship_package(spark)

    wanted = CODEC_FAMILIES if families is None else tuple(families)
    unknown = set(wanted) - set(CODEC_FAMILIES)
    if unknown:
        raise ValueError(f"unknown codec families: {sorted(unknown)}")
    per_session = _CODEC_STATS_PLANS.setdefault(spark, {})
    if wanted in per_session:
        return per_session[wanted]
    blobs = spark.read.parquet(CODEC_FIXTURE_PATH)
    by_family = {
        fam: blobs.filter(F.col("family") == fam)
        .select(F.col("payload_id").alias("doc_id"), "payload")
        for fam in wanted
    }
    parts: list[DataFrame] = []

    if "image" in by_family:
        img = decode_image(by_family["image"], errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            "width",
            "height",
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%.6f,%.6f,%.6f",
                    round6(F.col("mean_r")),
                    round6(F.col("mean_g")),
                    round6(F.col("mean_b")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(img)

    if "audio" in by_family:
        aud = decode_audio(by_family["audio"], errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%d,%.6f,%d,%.6f",
                    F.col("sample_rate"),
                    F.col("n_channels"),
                    F.col("n_frames"),
                    round6(F.col("duration_sec")),
                    F.col("peak"),
                    round6(F.col("rms")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(aud)

    if "image_meta" in by_family:
        imeta = image_meta(by_family["image_meta"], errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            "width",
            "height",
            F.when(F.col("error").isNull(), F.lit("meta"))
            .otherwise(_err_fp()).alias("fp"),
        )
        parts.append(imeta)

    if "video_meta" in by_family:
        vmeta = video_meta(by_family["video_meta"], errors="quarantine").select(
            "doc_id",
            F.col("brand").alias("fmt"),
            "width",
            "height",
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%.6f,%d,%d,%d,%s,%s",
                    round6(F.col("duration_sec")),
                    F.col("n_tracks"),
                    F.col("n_video_tracks"),
                    F.col("n_audio_tracks"),
                    F.coalesce(F.col("n_frames").cast("string"),
                               F.lit("-")),
                    F.col("codecs"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(vmeta)

    if "audio_meta" in by_family:
        ameta = audio_meta(by_family["audio_meta"], errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%.6f,%s",
                    F.col("sample_rate"),
                    F.col("n_channels"),
                    round6(F.col("duration_sec")),
                    F.col("detail"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(ameta)

    if "image_exif" in by_family:
        exif = image_exif(by_family["image_exif"], errors="quarantine").select(
            "doc_id",
            F.lit("exif").alias("fmt"),
            F.col("exif_width").alias("width"),
            F.col("exif_height").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.concat_ws(
                    "|",
                    F.coalesce(F.col("orientation").cast("string"),
                               F.lit("-")),
                    F.coalesce(F.col("datetime"), F.lit("-")),
                    F.coalesce(F.col("make"), F.lit("-")),
                    F.coalesce(F.col("model"), F.lit("-")),
                    F.when(
                        F.col("gps_lat").isNotNull(),
                        F.format_string("%.6f", round6(F.col("gps_lat"))),
                    ).otherwise(F.lit("-")),
                    F.when(
                        F.col("gps_lon").isNotNull(),
                        F.format_string("%.6f", round6(F.col("gps_lon"))),
                    ).otherwise(F.lit("-")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(exif)

    if "exif_strip" in by_family:
        estrip = strip_exif(
            by_family["exif_strip"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%s",
                    F.col("removed_bytes"),
                    F.md5(F.col("payload")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(estrip)

    if "audio_tags" in by_family:
        tags = audio_tags(by_family["audio_tags"], errors="quarantine").select(
            "doc_id",
            F.col("container").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.concat_ws(
                    "|",
                    F.coalesce(F.col("title"), F.lit("-")),
                    F.coalesce(F.col("artist"), F.lit("-")),
                    F.coalesce(F.col("album"), F.lit("-")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(tags)

    if "video_frame" in by_family:
        keyf = video_keyframe_features(
            by_family["video_frame"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("container").alias("fmt"),
            "width",
            "height",
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%s,%s,%d,%.6f,%.6f,%.6f",
                    F.col("codec"),
                    F.col("format"),
                    F.col("frame_bytes"),
                    round6(F.col("mean_r")),
                    round6(F.col("mean_g")),
                    round6(F.col("mean_b")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(keyf)

    if "audio_subband" in by_family:
        sband = audio_subband_features(
            by_family["audio_subband"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%d,%.6f,%.6f,%.6f,%.6f",
                    F.col("sample_rate"),
                    F.col("n_channels"),
                    F.col("n_mpeg_frames"),
                    round6(F.col("duration_sec")),
                    round6(F.col("sb_peak")),
                    round6(F.col("sb_rms")),
                    round6(F.col("sb_centroid")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(sband)

    if "archive" in by_family:
        arch = archive_meta(
            by_family["archive"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%s,%s,%s",
                    F.coalesce(F.col("n_members").cast("string"),
                               F.lit("-")),
                    F.col("uncompressed_hint").cast("string"),
                    F.col("detail"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(arch)

    if "warc_records" in by_family:
        wr = warc_records(by_family["warc_records"], errors="quarantine")
        warcf = wr.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("record_idx", "warc_type"))),
                    lambda s: s["warc_type"],
                ),
            ).alias("types"),
            F.max("http_status").alias("status"),
            F.sum(F.octet_length("body")).alias("body_bytes"),
            F.max("error_kind").alias("ek"),
        ).select(
            "doc_id",
            F.lit("warc").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("ek").isNull(),
                F.format_string(
                    "%d,%s,%s,%d",
                    F.col("n"),
                    F.col("types"),
                    F.coalesce(F.col("status").cast("string"), F.lit("-")),
                    F.col("body_bytes"),
                ),
            ).otherwise(F.concat(F.lit("ERR:"), F.col("ek"))).alias("fp"),
        )
        parts.append(warcf)

    if "document" in by_family:
        doc = pdf_text(by_family["document"], errors="quarantine").select(
            "doc_id",
            "format",
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%s,%d,%d,%s",
                    F.col("version"),
                    F.col("n_pages"),
                    F.col("n_chars"),
                    # newline/formfeed fold keeps the fp one SQL literal
                    F.translate(F.col("text"), "\n\f", "~|"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        ).withColumnRenamed("format", "fmt")
        parts.append(doc)

    if "document_meta" in by_family:
        dmeta = pdf_meta(
            by_family["document_meta"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.concat_ws(
                    "|",
                    F.format_string(
                        "%s,%d,%s,%s",
                        F.col("version"),
                        F.col("n_objects"),
                        F.coalesce(F.col("n_pages").cast("string"),
                                   F.lit("-")),
                        F.col("encrypted").cast("string"),
                    ),
                    F.coalesce(F.col("title"), F.lit("-")),
                    F.coalesce(F.col("author"), F.lit("-")),
                    F.coalesce(F.col("producer"), F.lit("-")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(dmeta)

    if "image_hash" in by_family:
        ih = image_hashes(
            by_family["image_hash"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("format").alias("fmt"),
            "width",
            "height",
            F.when(
                F.col("error").isNull(),
                # hex of the unsigned 64-bit codes — stable, readable
                F.format_string(
                    "%016x,%016x",
                    F.col("dhash"),
                    F.col("ahash"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(ih)

    if "office" in by_family:
        office = docx_text(by_family["office"], errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%s",
                    F.col("n_paragraphs"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n\t", "~·"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(office)

    if "image_thumb" in by_family:
        thumb = image_thumbnails(
            by_family["image_thumb"], errors="quarantine"
        ).select(
            "doc_id",
            F.col("format").alias("fmt"),
            "width",
            "height",
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%dx%d,%s",
                    F.col("thumb_w"),
                    F.col("thumb_h"),
                    F.md5(F.col("thumb")),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(thumb)

    if "subtitle" in by_family:
        subs = subtitles_text(by_family["subtitle"]).select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%.3f,%d,%s",
                    F.col("n_cues"),
                    F.col("duration_sec"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n", "~"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(subs)

    if "document_images" in by_family:
        pimg = pdf_images(by_family["document_images"], errors="quarantine")
        folded = pimg.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.concat_ws("|", F.array_sort(F.collect_list(F.concat_ws(
                ":",
                F.coalesce(F.col("page_idx").cast("string"), F.lit("-")),
                F.coalesce(F.col("image_idx").cast("string"), F.lit("-")),
                F.coalesce(F.col("name"), F.lit("-")),
                F.coalesce(F.col("format"), F.lit("-")),
                F.coalesce(F.col("width").cast("string"), F.lit("-")),
                F.coalesce(F.col("height").cast("string"), F.lit("-")),
                F.when(F.col("payload").isNotNull(),
                       F.md5(F.col("payload")))
                .otherwise(F.concat(F.lit("ERR:"),
                                    F.col("error_kind"))),
            )))).alias("imgs"),
        )
        # left-join from the payload list so a valid PDF with ZERO
        # image XObjects still yields its one-row-per-payload
        # fingerprint ('0,') instead of silently vanishing — an
        # extraction regression that returns [] must flip the golden,
        # not delete a row (r12 review fix)
        pimgf = (
            by_family["document_images"].select("doc_id")
            .join(folded, "doc_id", "left")
            .select(
                "doc_id",
                F.lit("pdfimg").alias("fmt"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.format_string(
                    "%d,%s",
                    F.coalesce(F.col("n"), F.lit(0)),
                    F.coalesce(F.col("imgs"), F.lit("")),
                ).alias("fp"),
            )
        )
        parts.append(pimgf)

    if "office_pptx" in by_family:
        from ..operators.archives import pptx_text

        ppt = pptx_text(by_family["office_pptx"],
                        errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%d,%s",
                    F.col("n_slides"),
                    F.col("n_paragraphs"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n\f", "~|"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(ppt)

    if "office_xlsx" in by_family:
        from ..operators.archives import xlsx_text

        xls = xlsx_text(by_family["office_xlsx"],
                        errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%d,%s",
                    F.col("n_sheets"),
                    F.col("n_cells"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n\t\f", "~·|"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(xls)

    if "office_odf" in by_family:
        from ..operators.archives import odf_text

        odf = odf_text(by_family["office_odf"],
                       errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%s",
                    F.col("n_paragraphs"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n\t", "~·"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(odf)

    if "document_epub" in by_family:
        from ..operators.archives import epub_text

        epub = epub_text(by_family["document_epub"],
                         errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%s",
                    F.col("n_chapters"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n\f", "~|"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(epub)

    if "mail_eml" in by_family:
        from ..operators.mail import eml_text

        eml = eml_text(by_family["mail_eml"],
                       errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%s|%s|%d|%d|%d|%s",
                    F.coalesce(F.col("subject"), F.lit("-")),
                    F.coalesce(F.col("sender"), F.lit("-")),
                    F.col("n_parts"),
                    F.col("n_attachments"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n", "~"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(eml)

    if "document_rtf" in by_family:
        from ..operators.rtf import rtf_text

        rtfp = rtf_text(by_family["document_rtf"],
                        errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%s",
                    F.col("n_groups"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n\t", "~·"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(rtfp)

    if "document_latex" in by_family:
        from ..operators.latex import latex_text

        ltx = latex_text(by_family["document_latex"],
                         errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%s",
                    F.col("n_dropped"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n", "~"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(ltx)

    if "document_ipynb" in by_family:
        from ..operators.notebooks import ipynb_text

        ipy = ipynb_text(by_family["document_ipynb"],
                         errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%s|%d,%d,%d|%d|%s",
                    F.coalesce(F.col("language"), F.lit("-")),
                    F.col("n_cells"),
                    F.col("n_code_cells"),
                    F.col("n_md_cells"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n", "~"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(ipy)

    if "document_markdown" in by_family:
        from ..operators.markdown import markdown_text

        mdn = markdown_text(by_family["document_markdown"],
                            errors="quarantine").select(
            "doc_id",
            F.col("format").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(
                F.col("error").isNull(),
                F.format_string(
                    "%d,%d,%d|%d|%s",
                    F.col("n_headings"),
                    F.col("n_code_blocks"),
                    F.col("n_links"),
                    F.col("n_chars"),
                    F.translate(F.col("text"), "\n", "~"),
                ),
            ).otherwise(_err_fp()).alias("fp"),
        )
        parts.append(mdn)

    if "image_pages" in by_family:
        from ..operators.tiff import tiff_page_images

        tpg = tiff_page_images(by_family["image_pages"],
                               errors="quarantine")
        tfolded = tpg.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.concat_ws("|", F.array_sort(F.collect_list(F.concat_ws(
                ":",
                F.coalesce(F.col("page_idx").cast("string"), F.lit("-")),
                F.coalesce(F.col("format"), F.lit("-")),
                F.coalesce(F.col("width").cast("string"), F.lit("-")),
                F.coalesce(F.col("height").cast("string"), F.lit("-")),
                F.when(F.col("payload").isNotNull(),
                       F.md5(F.col("payload")))
                .otherwise(F.concat(F.lit("ERR:"),
                                    F.col("error_kind"))),
            )))).alias("pages"),
        )
        # same left-join-from-payloads shape as document_images: an
        # extraction regression to [] must flip the golden, not
        # delete the row
        tpgf = (
            by_family["image_pages"].select("doc_id")
            .join(tfolded, "doc_id", "left")
            .select(
                "doc_id",
                F.lit("tiffpages").alias("fmt"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.format_string(
                    "%d,%s",
                    F.coalesce(F.col("n"), F.lit(0)),
                    F.coalesce(F.col("pages"), F.lit("")),
                ).alias("fp"),
            )
        )
        parts.append(tpgf)

    if not parts:
        raise ValueError("codec_stats: empty families selection")
    result = parts[0]
    for part in parts[1:]:
        result = result.unionByName(part)
    per_session[wanted] = result
    return result
