"""Archive/WARC operator tests (operators/archives.py): stdlib-built
gzip/zip/tar fixtures and hand-rolled WARC records."""

from __future__ import annotations

import gzip
import io
import struct
import tarfile
import zipfile

import pytest

from youtube_api_data_etl_automation_spark.operators import archives


def _warc_record(wtype, content, uri=None, extra=()):
    head = [b"WARC/1.0",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: <urn:uuid:0000>",
            b"WARC-Date: 2024-01-02T03:04:05Z"]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.extend(extra)
    head.append(b"Content-Length: " + str(len(content)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + content + b"\r\n\r\n"


def _http_response(body, status=200, ctype="text/html; charset=utf-8"):
    return (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def _warc(per_record_gzip=False):
    info = _warc_record("warcinfo", b"software: test\r\n")
    req = _warc_record(
        "request", b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
        uri="https://example.com/",
        extra=(b"Content-Type: application/http;msgtype=request",))
    body = "<html>hello wörld</html>".encode()
    resp = _warc_record(
        "response", _http_response(body),
        uri="https://example.com/",
        extra=(b"Content-Type: application/http;msgtype=response",))
    records = [info, req, resp]
    if per_record_gzip:
        return b"".join(gzip.compress(r, mtime=0) for r in records), body
    return b"".join(records), body


def _zip(members=(("a.txt", b"alpha"), ("dir/b.bin", b"\x00" * 100))):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            # pinned timestamp: ZipInfo defaults to wall-clock now,
            # which breaks byte-deterministic fixture regeneration
            zi = zipfile.ZipInfo(name, date_time=(2024, 1, 2, 3, 4, 6))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def _tar(members=(("x.txt", b"xx"), ("y.txt", b"y" * 600))):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) \
            as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def _blob_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows],
        "doc_id long, payload binary")


def test_archive_meta_probe(spark):
    gz = gzip.compress(b"hello " * 100, mtime=123)
    # add an FNAME member for the detail field
    named = io.BytesIO()
    with gzip.GzipFile(filename="doc.txt", fileobj=named, mode="wb",
                       mtime=7) as f:
        f.write(b"content")
    warc_plain, _ = _warc()
    warc_gz, _ = _warc(per_record_gzip=True)
    rows = [(1, gz), (2, named.getvalue()), (3, _zip()), (4, _tar()),
            (5, warc_plain), (6, warc_gz), (7, b"RAR!junk"), (8, b"")]
    out = {r["doc_id"]: r for r in archives.archive_meta(
        _blob_df(spark, rows), errors="quarantine").collect()}
    assert out[1]["format"] == "gzip"
    assert out[1]["uncompressed_hint"] == 600
    assert "mtime=123" in out[1]["detail"]
    assert "name=doc.txt" in out[2]["detail"]
    z = out[3]
    assert (z["format"], z["n_members"]) == ("zip", 2)
    assert z["uncompressed_hint"] == 105
    assert "a.txt" in z["detail"]
    t = out[4]
    assert (t["format"], t["n_members"]) == ("tar", 2)
    assert t["uncompressed_hint"] == 602
    for d in (5, 6):
        w = out[d]
        assert (w["format"], w["n_members"]) == ("warc", 3)
        assert w["detail"] == "warcinfo"
    assert out[7]["error_kind"] == "unsupported"
    assert out[8]["error_kind"] == "corrupt"


def test_warc_records_plain_and_gzip(spark):
    for per_gz in (False, True):
        payload, body = _warc(per_record_gzip=per_gz)
        rows = archives.warc_records(
            _blob_df(spark, [(1, payload)])).collect()
        assert [r["warc_type"] for r in rows] == \
            ["warcinfo", "request", "response"]
        resp = rows[2]
        assert resp["record_idx"] == 2
        assert resp["target_uri"] == "https://example.com/"
        assert resp["warc_date"] == "2024-01-02T03:04:05Z"
        assert resp["http_status"] == 200
        assert resp["http_content_type"] == "text/html; charset=utf-8"
        assert bytes(resp["body"]) == body
        assert rows[0]["http_status"] is None
        assert bytes(rows[0]["body"]) == b"software: test\r\n"


def test_warc_refusals(spark):
    payload, _ = _warc()
    rows = [(1, payload[:-60]),        # truncated record body
            (2, b"NOT A WARC"),
            (3, gzip.compress(payload)[:20])]  # truncated gzip
    out = {r["doc_id"]: r for r in archives.warc_records(
        _blob_df(spark, rows)).collect()}
    assert out[1]["error_kind"] == "corrupt"
    assert "truncated" in out[1]["error"]
    assert out[2]["error_kind"] == "corrupt"
    assert out[3]["error_kind"] == "corrupt"
    # decompressed-byte budget routes 'unsupported' pre-allocation
    big = archives.warc_records(
        _blob_df(spark, [(9, gzip.compress(payload))]),
        byte_budget=64).collect()[0]
    assert big["error_kind"] == "unsupported"
    with pytest.raises(Exception, match="truncated|malformed"):
        archives.warc_records(_blob_df(spark, [(1, payload[:-60])]),
                              errors="raise").collect()


def test_unpack_gzip_text(spark):
    text = "olá mundo " * 50
    out = archives.unpack_gzip_text(_blob_df(
        spark, [(1, gzip.compress(text.encode()))])).collect()[0]
    assert out["text"] == text
    assert out["n_bytes"] == len(text.encode())
    small = archives.unpack_gzip_text(
        _blob_df(spark, [(1, gzip.compress(text.encode()))]),
        byte_budget=16).collect()[0]
    assert small["error_kind"] == "unsupported"
    bad = archives.unpack_gzip_text(
        _blob_df(spark, [(1, b"plain")])).collect()[0]
    assert bad["error_kind"] == "corrupt"


def test_zip_members(spark):
    payload = _zip()
    rows = archives.zip_members(_blob_df(spark, [(1, payload)])).collect()
    assert [(r["name"], r["size"]) for r in rows] == \
        [("a.txt", 5), ("dir/b.bin", 100)]
    assert bytes(rows[0]["body"]) == b"alpha"
    assert bytes(rows[1]["body"]) == b"\x00" * 100
    assert rows[1]["compressed_size"] < 100  # deflate really ran
    # declared-size budget refuses BEFORE inflating anything
    out = archives.zip_members(_blob_df(spark, [(1, payload)]),
                               byte_budget=50).collect()[0]
    assert out["error_kind"] == "unsupported"
    out = archives.zip_members(
        _blob_df(spark, [(1, b"PK\x03\x04garbage")])).collect()[0]
    assert out["error_kind"] == "corrupt"


def test_zip_duplicate_member_names_keep_both_bodies(spark):
    """r12 (ADVICE): zf.read(name) resolves through NameToInfo (last
    entry wins), so duplicate member names would both yield the LAST
    member's bytes — reading by ZipInfo preserves each body."""
    payload = _zip(members=(("same.txt", b"first"), ("same.txt", b"second")))
    rows = archives.zip_members(_blob_df(spark, [(1, payload)])).collect()
    assert [bytes(r["body"]) for r in rows] == [b"first", b"second"]
    members = archives._iter_archive_members(payload, budget=None)
    assert members == [("same.txt", b"first"), ("same.txt", b"second")]


def test_zip_eocd_with_comment_and_bounds():
    payload = _zip() + b""  # plain
    meta = archives._parse_zip_meta(payload)
    assert meta["n_members"] == 2
    # EOCD scan tolerates a trailing comment
    commented = bytearray(_zip())
    struct.pack_into("<H", commented, len(commented) - 2, 9)
    commented += b"a comment"
    assert archives._parse_zip_meta(bytes(commented))["n_members"] == 2
    with pytest.raises(ValueError, match="central directory"):
        archives._parse_zip_meta(_zip()[len(_zip()) // 2 :])


def test_warc_body_text_and_malformed_bytes(spark):
    body = "ok é".encode() + b"\xff\xfe"  # trailing crawl garbage
    rec = _warc_record(
        "response", _http_response(body),
        uri="https://x.example/a",
        extra=(b"Content-Type: application/http;msgtype=response",))
    r = archives.warc_records(_blob_df(spark, [(1, rec)])).collect()[0]
    assert r["body_text"].startswith("ok é")
    assert "�" in r["body_text"]  # replacement, not a task kill
    # binary responses keep body bytes but no text
    img = _warc_record(
        "response", _http_response(b"\x89PNG...", ctype="image/png"),
        uri="https://x.example/i",
        extra=(b"Content-Type: application/http;msgtype=response",))
    r = archives.warc_records(_blob_df(spark, [(1, img)])).collect()[0]
    assert r["body_text"] is None and bytes(r["body"]) == b"\x89PNG..."


def test_warc_to_documents_composition(spark):
    from youtube_api_data_etl_automation_spark.corpus import (
        warc_to_documents,
    )

    html = (b"<html><body><h1>Title</h1><p>This is the kind of page "
            b"that the crawler keeps: it has enough plain English "
            b"words for the language heuristic and the quality "
            b"scorer to pass it through the funnel.</p></body></html>")
    ok = _warc_record(
        "response", _http_response(html),
        uri="https://x.example/page",
        extra=(b"Content-Type: application/http;msgtype=response",))
    notfound = _warc_record(
        "response", _http_response(b"<html>gone</html>", status=404),
        uri="https://x.example/missing",
        extra=(b"Content-Type: application/http;msgtype=response",))
    png = _warc_record(
        "response", _http_response(b"\x89PNG", ctype="image/png"),
        uri="https://x.example/img",
        extra=(b"Content-Type: application/http;msgtype=response",))
    info = _warc_record("warcinfo", b"software: test\r\n")
    payload = info + ok + notfound + png
    docs = warc_to_documents(
        _blob_df(spark, [(7, payload), (8, b"broken")])).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["source"] == "https://x.example/page"
    assert "crawler keeps" in d["text"] and "<p>" not in d["text"]
    assert d["lang"] is None and d["n_chars"] == len(d["text"])
    # doc_id is stable across re-ingestion
    again = warc_to_documents(
        _blob_df(spark, [(7, payload)])).collect()[0]
    assert again["doc_id"] == d["doc_id"]
    # and the result feeds curate_corpus directly
    from youtube_api_data_etl_automation_spark.corpus import curate_corpus
    out = curate_corpus(
        warc_to_documents(_blob_df(spark, [(7, payload)])),
        min_tokens=1, max_tokens=100, quality_min=0.0, audit=True)
    assert out["documents"].count() == 1


def test_wet_conversion_records_decode_text(spark):
    """WET-shaped files: 'conversion' records carry pre-extracted
    text/plain content with no HTTP envelope — warc_records must decode
    their text, and warc_to_documents ingests them when asked."""
    from youtube_api_data_etl_automation_spark.corpus import (
        warc_to_documents,
    )
    from youtube_api_data_etl_automation_spark.operators.archives import (
        warc_records,
    )

    conv = _warc_record(
        "conversion", "Extracted plain text wörds.".encode(),
        uri="https://x.example/page",
        extra=(b"Content-Type: text/plain",))
    info = _warc_record("warcinfo", b"software: wet-test\r\n")
    payload = info + conv
    recs = {r["warc_type"]: r for r in
            warc_records(_blob_df(spark, [(3, payload)])).collect()}
    assert recs["conversion"]["body_text"] == "Extracted plain text wörds."
    assert recs["conversion"]["http_status"] is None
    # default record_types: conversion records are NOT documents
    assert warc_to_documents(_blob_df(spark, [(3, payload)])).count() == 0
    docs = warc_to_documents(
        _blob_df(spark, [(3, payload)]),
        record_types=("response", "conversion"), strip_html=False,
    ).collect()
    assert len(docs) == 1
    assert docs[0]["text"] == "Extracted plain text wörds."
    assert docs[0]["source"] == "https://x.example/page"


def test_warc_pdf_to_documents_composition(spark):
    """application/pdf crawl responses route through the PDF extractor
    with the URI riding along; non-PDF and broken-PDF responses drop."""
    from tests.test_pdf import one_page

    from youtube_api_data_etl_automation_spark.corpus import (
        warc_pdf_to_documents,
    )

    pdf_body = one_page(b"BT /F1 11 Tf (A PDF fetched from the crawl) "
                        b"Tj ET")
    ok = _warc_record(
        "response", _http_response(pdf_body, ctype="application/pdf"),
        uri="https://x.example/paper.pdf",
        extra=(b"Content-Type: application/http;msgtype=response",))
    html = _warc_record(
        "response", _http_response(b"<html>not pdf</html>"),
        uri="https://x.example/page",
        extra=(b"Content-Type: application/http;msgtype=response",))
    broken = _warc_record(
        "response", _http_response(b"%PDF-1.4 truncated",
                                   ctype="application/pdf; v=1"),
        uri="https://x.example/bad.pdf",
        extra=(b"Content-Type: application/http;msgtype=response",))
    payload = ok + html + broken
    docs = warc_pdf_to_documents(_blob_df(spark, [(5, payload)])).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["text"] == "A PDF fetched from the crawl"
    assert d["source"] == "https://x.example/paper.pdf"
    again = warc_pdf_to_documents(
        _blob_df(spark, [(5, payload)])).collect()[0]
    assert again["doc_id"] == d["doc_id"]


def test_archive_members_zip_tar_gzip(spark):
    """Uniform member extraction across the three container formats,
    incl. .tar.gz; unknown magic refuses 'unsupported'."""
    import gzip as gz
    import io

    from youtube_api_data_etl_automation_spark.operators.archives import (
        archive_members,
    )

    tarball = _tar(members=(("a/x.bin", b"\x01\x02\x03"),
                            ("y.txt", b"hello tar")))
    targz = gz.compress(tarball, mtime=0)
    named = io.BytesIO()
    with gz.GzipFile(filename="doc.txt", fileobj=named, mode="wb",
                     mtime=3) as f:
        f.write(b"gzip body")
    rows = archive_members(_blob_df(spark, [
        (1, _zip()), (2, tarball), (3, targz),
        (4, named.getvalue()), (5, b"RAR!nope"),
    ])).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    assert [(r["name"], bytes(r["body"])) for r in sorted(
        by[1], key=lambda r: r["member_idx"])] == [
        ("a.txt", b"alpha"), ("dir/b.bin", b"\x00" * 100)]
    for d in (2, 3):
        assert [(r["name"], bytes(r["body"])) for r in sorted(
            by[d], key=lambda r: r["member_idx"])] == [
            ("a/x.bin", b"\x01\x02\x03"), ("y.txt", b"hello tar")]
    assert by[4][0]["name"] == "doc.txt"
    assert bytes(by[4][0]["body"]) == b"gzip body"
    assert by[5][0]["error_kind"] == "unsupported"


def test_archive_members_budget_refuses_from_headers(spark):
    from youtube_api_data_etl_automation_spark.operators.archives import (
        archive_members,
    )

    big = _tar(members=(("big.bin", b"z" * 4096),))
    rows = archive_members(_blob_df(spark, [(1, big)]),
                           byte_budget=1000).collect()
    assert rows[0]["error_kind"] == "unsupported"
    assert "budget" in rows[0]["error"]


def test_archive_to_decoders_composition(spark):
    """The crawl-dump loop: a tarball carrying a PNG and a PDF →
    archive_members → members_as_payloads → triage / pdf_text, with
    member names riding as provenance."""
    from tests.test_operators import _png
    from tests.test_pdf import one_page

    from youtube_api_data_etl_automation_spark.operators.archives import (
        archive_members,
        members_as_payloads,
    )
    from youtube_api_data_etl_automation_spark.operators.mediameta import (
        triage_decode_images,
    )
    from youtube_api_data_etl_automation_spark.operators.pdf import pdf_text

    png = _png([[(x * 9 % 256, y * 31 % 256, 7) for x in range(6)]
                for y in range(4)])
    pdf = one_page(b"BT (doc inside a tarball) Tj ET")
    tarball = _tar(members=(("img/pic.png", png), ("docs/a.pdf", pdf)))
    payloads = members_as_payloads(
        archive_members(_blob_df(spark, [(9, tarball)])))
    rows = {r["source"]: r for r in payloads.collect()}
    assert set(rows) == {"img/pic.png", "docs/a.pdf"}
    img_rows = triage_decode_images(
        payloads.filter("source = 'img/pic.png'")).collect()
    assert len(img_rows) == 1 and img_rows[0]["width"] == 6
    txt_rows = pdf_text(
        payloads.filter("source = 'docs/a.pdf'"),
        errors="quarantine").collect()
    assert txt_rows[0]["text"] == "doc inside a tarball"
    assert txt_rows[0]["source"] == "docs/a.pdf"  # passthrough
    # stable ids across re-ingestion
    again = {r["source"]: r["doc_id"] for r in members_as_payloads(
        archive_members(_blob_df(spark, [(9, tarball)]))).collect()}
    assert again == {s: r["doc_id"] for s, r in rows.items()}


def _docx(xml_body: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("word/document.xml",
                             date_time=(2024, 1, 2, 3, 4, 6))
        zi.compress_type = zipfile.ZIP_DEFLATED
        zf.writestr(zi, b'<?xml version="1.0"?><w:document>'
                    b"<w:body>" + xml_body + b"</w:body></w:document>")
        zi2 = zipfile.ZipInfo("[Content_Types].xml",
                              date_time=(2024, 1, 2, 3, 4, 6))
        zf.writestr(zi2, b"<Types/>")
    return buf.getvalue()


def test_docx_text_extraction(spark):
    xml = (b'<w:p><w:r><w:t>Hello </w:t></w:r>'
           b'<w:r><w:t xml:space="preserve">w&amp;rld &amp;lt;tag&gt;'
           b"</w:t></w:r></w:p>"
           b"<w:p><w:r><w:t>Line</w:t><w:br/><w:t>break</w:t>"
           b"<w:tab/><w:t>tabbed</w:t></w:r></w:p>")
    legacy_doc = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64
    rows = {r["doc_id"]: r for r in archives.docx_text(_blob_df(spark, [
        (1, _docx(xml)),
        (2, legacy_doc),
        (3, _zip()),          # a zip but not a docx
        (4, b"not even zip"),
    ])).collect()}
    d = rows[1]
    assert d["format"] == "docx" and d["error"] is None
    assert d["n_paragraphs"] == 2
    assert d["text"] == "Hello w&rld &lt;tag>\nLine\nbreak\ttabbed"
    assert d["n_chars"] == len(d["text"])
    assert rows[2]["error_kind"] == "unsupported"      # legacy .doc
    assert "OLE2" in rows[2]["error"]
    assert rows[3]["error_kind"] == "corrupt"          # no document.xml
    assert rows[4]["error_kind"] == "corrupt"


def test_docx_budget_refuses_from_central_directory(spark):
    big = _docx(b"<w:p><w:r><w:t>" + b"x" * 5000 + b"</w:t></w:r></w:p>")
    row = archives.docx_text(_blob_df(spark, [(1, big)]),
                             byte_budget=100).collect()[0]
    assert row["error_kind"] == "unsupported"
    assert "budget" in row["error"]


def test_docx_to_documents_composition(spark):
    from youtube_api_data_etl_automation_spark.corpus import (
        docx_to_documents,
    )

    xml = (b"<w:p><w:r><w:t>Plenty of plain English words make this "
           b"document pass any downstream funnel stage</w:t></w:r></w:p>")
    df = _blob_df(spark, [(11, _docx(xml)), (12, b"broken")])
    docs = docx_to_documents(df).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["source"] == "docx:11" and "funnel stage" in d["text"]
    assert d["n_chars"] == len(d["text"]) and d["lang"] is None
    again = docx_to_documents(df).collect()[0]
    assert again["doc_id"] == d["doc_id"]


def test_bzip2_xz_archives(spark):
    """late r14: the stdlib compressors beyond gzip — bare documents,
    tarballs, concatenated streams, budgets, refusal routing."""
    import bz2 as _bz2
    import lzma as _lzma

    from youtube_api_data_etl_automation_spark.operators import (
        archives as A,
    )

    body = b"corpus text " * 40
    tar = _tar((("x/a.txt", b"alpha"), ("x/b.txt", b"beta")))
    bz_doc = _bz2.compress(body)
    xz_doc = _lzma.compress(body, format=_lzma.FORMAT_XZ)
    rows = {r["doc_id"]: r for r in A.archive_meta(_blob_df(spark, [
        (1, bz_doc), (2, xz_doc)]), errors="quarantine").collect()}
    assert rows[1]["format"] == "bzip2" and rows[1]["error"] is None
    assert rows[1]["detail"] == "level=9"
    assert rows[2]["format"] == "xz"
    # members: tar.bz2 / tar.xz walk; bare docs emit one unnamed row
    ms = {(r["doc_id"], r["name"]): r for r in A.archive_members(
        _blob_df(spark, [
            (3, _bz2.compress(tar)),
            (4, _lzma.compress(tar, format=_lzma.FORMAT_XZ)),
            (5, bz_doc),
        ])).collect()}
    assert bytes(ms[(3, "x/a.txt")]["body"]) == b"alpha"
    assert bytes(ms[(4, "x/b.txt")]["body"]) == b"beta"
    assert bytes(ms[(5, "")]["body"]) == body
    # concatenated streams (pbzip2 layout) decode whole
    assert A._bunzip_all(bz_doc + bz_doc, None) == body + body
    assert A._unxz_all(xz_doc + xz_doc, None) == body + body
    # budgets refuse BEFORE materializing
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="budget"):
        A._bunzip_all(bz_doc, 16)
    with _pytest.raises(NotImplementedError, match="budget"):
        A._unxz_all(xz_doc, 16)
    # truncation is malformed, not a crash
    with _pytest.raises(ValueError, match="truncated"):
        A._bunzip_all(bz_doc[:-4], None)
    with _pytest.raises(ValueError, match="truncated"):
        A._unxz_all(xz_doc[:-4], None)
    # sniff routes both (engine side)
    from youtube_api_data_etl_automation_spark.operators.mediameta \
        import sniff_format

    sn = {r["doc_id"]: (r["sniff_family"], r["sniff_format"])
          for r in sniff_format(_blob_df(spark, [
              (1, bz_doc), (2, xz_doc), (3, b"BZx not bzip"),
          ])).collect()}
    assert sn[1] == ("archive", "bzip2")
    assert sn[2] == ("archive", "xz")
    assert sn[3] == ("unknown", None)
