"""The r14 Column-fragment memo (functions/colcache.py): identity,
fall-through, cross-plan reuse, and value equivalence of the memoized
builders against fresh construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_data_etl_automation_spark.functions import colcache
from youtube_api_data_etl_automation_spark.functions.urls import (
    url_host,
    url_normalize,
)


def test_name_memo_identity_and_fallthrough(spark):
    # str input: the SAME Column object comes back (one build per name)
    a = url_host("u")
    b = url_host("u")
    assert a is b
    # different name: different entry
    assert url_host("v") is not a
    # Column input: never memoized — fresh tree per call
    c1 = url_host(F.col("u"))
    c2 = url_host(F.col("u"))
    assert c1 is not c2


def test_memo_call_keys(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return F.lit(calls["n"])

    x = colcache.memo_call("t.test", ("a",), build)
    y = colcache.memo_call("t.test", ("a",), build)
    assert x is y and calls["n"] == 1
    z = colcache.memo_call("t.test", ("b",), build)
    assert z is not x and calls["n"] == 2


def test_memoized_fragment_reused_across_plans(spark):
    """One memoized Column used in two different DataFrames and twice
    inside one union plan must bind independently per plan — the
    view-body property the memo relies on."""
    rows = [
        ("https://A.example.com:443/p?utm_source=x&b=2&a=1#f",),
        ("http://site.org:80/",),
        ("not a url",),
        ("http://[::1]:8080/x",),
    ]
    d1 = spark.createDataFrame(rows, "u string")
    d2 = spark.createDataFrame([(r[0].upper(),) for r in rows], "u string")
    norm = url_normalize("u")  # memoized fragment
    assert norm is url_normalize("u")
    out1 = [r[0] for r in d1.select(norm.alias("c")).collect()]
    out2 = [r[0] for r in d2.select(norm.alias("c")).collect()]
    assert out1[0] == "https://a.example.com/p?a=1&b=2"
    assert out1[1] == "http://site.org/"
    assert out1[2] == "not a url"          # schemeless passthrough
    assert out1[3] == "http://[::1]:8080/x"  # IPv6 passthrough
    assert out2 != out1  # the second plan bound its own input
    # same fragment twice inside ONE plan (two union arms)
    u = d1.select(norm.alias("c")).unionAll(d1.select(norm.alias("c")))
    assert u.count() == 8


def test_memoized_equals_fresh_build(spark):
    """The memoized tree and a bypass (fresh) build agree row-for-row
    on adversarial URLs."""
    rows = [
        ("HTTPS://User:p@Host.Example.COM./a/b?z=1&fbclid=t&y=2#frag",),
        ("https://example.co.uk:8443/?utm_campaign=x",),
        ("ftp://files.example.com:21/path",),
        ("https://example.com",),
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "u string")
    fresh = url_normalize.__wrapped__("u")
    got = df.select(
        url_normalize("u").alias("m"), fresh.alias("f")
    ).collect()
    for r in got:
        assert r["m"] == r["f"]
