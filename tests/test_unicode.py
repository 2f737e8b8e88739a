"""Unicode normalization / mojibake repair (functions/unicodefns.py):
planted-damage cases pinning the documented pipeline order, a pure-Python
reference differential, and a DuckDB differential proving the SQL mirror is
byte-identical (the property the driver's `pii_redact_docs` row checks at
corpus scale)."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row

from youtube_api_data_etl_automation_spark.functions.unicodefns import (
    CONTROL_RE,
    FOLDS,
    MOJIBAKE,
    TRANSLATE_FROM,
    TRANSLATE_TO,
    mojibake_count,
    normalize_unicode,
    sql_mojibake_count,
    sql_normalize_unicode,
)

CASES = [
    # cp1252 mojibake repairs, incl. the U+201D artifact whose third byte
    # surfaces as C1 U+009D
    ("donâ€™t say â€œhiâ€\x9d now",
     'don\'t say "hi" now'),
    ("cafÃ© maÃ±ana Ã¼ber", "café mañana über"),
    # fullwidth block folds onto ASCII, ideographic space → space
    ("ＴＥＳＴ　１２３！", "TEST 123!"),
    # zero-width/invisible deletions, unicode spaces, curly quotes, dashes
    ("a​b‌c﻿d­e", "abcde"),
    ("x y z !", "x y z !"),
    ("‘q’ “d” – — − …", "'q' \"d\" - - - ..."),
    # C0 (minus \t\n\r) + DEL + C1 stripped; tab/newline kept
    ("k\x01e\x02e\x7fp\x85\t\n", "keep\t\n"),
    # 7-bit clean text untouched
    ("plain ascii, unchanged.", "plain ascii, unchanged."),
    ("", ""),
]


def test_normalize_unicode_cases(spark):
    df = spark.createDataFrame([Row(i=i, t=t) for i, (t, _) in enumerate(CASES)])
    got = {r["i"]: r["out"] for r in
           df.select("i", normalize_unicode("t").alias("out")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_normalize_unicode_null_count_and_collapse(spark):
    df = spark.createDataFrame(
        [Row(t=None), Row(t="aâ€™b  c　　d")], "t string"
    )
    rows = df.select(
        normalize_unicode("t", collapse_ws=True).alias("s"),
        mojibake_count("t").alias("n"),
    ).collect()
    assert rows[0]["s"] is None and rows[0]["n"] is None
    assert rows[1]["s"] == "a'b c d" and rows[1]["n"] == 1


def _py_normalize(t: str) -> str:
    """Independent pure-Python reference of the documented pipeline."""
    import re

    for bad, good in MOJIBAKE + FOLDS:
        t = t.replace(bad, good)
    t = t.translate(
        {ord(f): (TRANSLATE_TO[i] if i < len(TRANSLATE_TO) else None)
         for i, f in enumerate(TRANSLATE_FROM)}
    )
    return re.sub(CONTROL_RE, "", t)


def test_matches_python_reference_randomized(spark):
    """300 seeded random strings mixing every damage class against an
    independently written Python reference — catches table/order drift
    between the Column pipeline and the documented contract."""
    import random

    rng = random.Random(7)
    atoms = (
        [bad for bad, _ in MOJIBAKE]
        + ["Ａｎｔ", "　", "​", "﻿", "­",
           "‘", "”", "–", "…", " ", "\x01", "\x7f",
           "\x9d", "word", " ", "\t", "\n", "'", '"', "é", "…"]
    )
    cases = ["".join(rng.choice(atoms) for _ in range(rng.randint(0, 30)))
             for _ in range(300)]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(cases)])
    got = {r["i"]: r["out"] for r in
           df.select("i", normalize_unicode("t").alias("out")).collect()}
    for i, t in enumerate(cases):
        assert got[i] == _py_normalize(t), f"case {i}: {t!r}"


def test_sql_mirror_randomized_differential(spark):
    """The same seeded corpus through Spark and the DuckDB mirror — any
    Java-vs-RE2 or replace/translate semantics drift shows up here (the
    exact property the driver's oracle row relies on)."""
    import random

    rng = random.Random(13)
    atoms = (
        [bad for bad, _ in MOJIBAKE]
        + ["ＴＥ", "　", "​‌", "﻿", "­",
           "’", "“", "—", "…", " ", "\x02", "\x85",
           "text", " ", "\t", "\n", "'", '"', "ü…"]
    )
    cases = ["".join(rng.choice(atoms) for _ in range(rng.randint(0, 30)))
             for _ in range(300)]
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(cases)])
    got = {
        r["i"]: (r["out"], r["n"])
        for r in df.select(
            "i",
            normalize_unicode("t").alias("out"),
            mojibake_count("t").alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(cases)))
    want = dict(
        (i, (s, n))
        for i, s, n in con.execute(
            f"SELECT i, {sql_normalize_unicode('t')}, {sql_mojibake_count('t')} FROM c"
        ).fetchall()
    )
    mismatches = {i: (got[i], want[i], cases[i]) for i in got if got[i] != want[i]}
    assert not mismatches, (
        f"{len(mismatches)} diverge, e.g. {next(iter(mismatches.items()))}"
    )


def test_translate_tables_are_sane():
    """Deletion tail: every FROM char beyond len(TO) is an invisible; the
    fullwidth prefix maps exactly onto printable ASCII."""
    assert len(TRANSLATE_FROM) > len(TRANSLATE_TO)
    mapped = TRANSLATE_FROM[: len(TRANSLATE_TO)]
    deleted = TRANSLATE_FROM[len(TRANSLATE_TO):]
    assert all(ord(c) > 0x7F for c in deleted)
    assert len(set(TRANSLATE_FROM)) == len(TRANSLATE_FROM)  # no dup keys
    for f, to in zip(mapped[:94], TRANSLATE_TO[:94]):
        assert ord(f) - ord(to) == 0xFEE0  # fullwidth block
