"""Unicode normalization / mojibake repair for web-corpus curation.

Raw crawl text carries systematic unicode damage: UTF-8 bytes decoded as
cp1252 ("â€™" where "'" was meant), fullwidth ASCII from CJK sources
("ＴＥＳＴ"), zero-width characters that split tokens invisibly, and a zoo
of space/dash/quote codepoints that fragment n-gram and shingle statistics.
Normalizing them is a standard early curation step (cf. ftfy / C4-style
cleanup) — it runs BEFORE tokenization, dedup shingling, and language ID so
that "don't" spelled with U+2019 and its mojibake twin share one surface
form.

All pure Column expressions — JVM-side, codegen'd, zero Python on the data
path (Spark has no NFKC builtin, so this is the deterministic, oracle-
mirrorable subset that covers what a web corpus actually contains rather
than a Pandas-UDF round-trip through ``unicodedata``):

1. cp1252-mojibake repair — literal multi-char replaces, longest sequences
   first (every U+20xx artifact starts with "â€", so 3-char repairs run
   before any 2-char "Ã©"-class repair could corrupt them),
2. multi-char punctuation folds ("…" → "..."),
3. one ``translate`` pass: fullwidth ASCII → ASCII (U+FF01–U+FF5E and the
   ideographic space), unicode spaces → ' ', curly quotes → straight,
   dash variants → '-', and DELETION of zero-width/invisible codepoints
   (ZWSP/ZWNJ/ZWJ/BOM/soft-hyphen/word-joiner/LRM/RLM) — Spark and DuckDB
   agree that 'from' chars with no 'to' counterpart are dropped,
4. control-character strip (C0 minus \\t\\n\\r, DEL, and the whole C1
   block — C1 stragglers are mostly half-repaired mojibake) — shared
   Java/RE2 regex subset,
5. optional whitespace collapse + trim (off by default: chunkers and
   line-based quality rules may need newlines; the curation plan row
   turns it on).

All invisible/non-keyboard codepoints below are built with ``chr()`` so the
source file itself stays unambiguous.

At 100 TB this is a map-only projection: no shuffle, linear scan, and the
normalized column ships in the same scan-to-sink pass as the PII scrub and
markup strip (plans/curation.py composes all three).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _cp1252_mojibake(cp: int) -> str:
    """The cp1252 mis-decoding of codepoint ``cp``'s UTF-8 bytes."""
    return chr(cp).encode("utf-8").decode("cp1252")


# cp1252 mojibake: UTF-8 encodings of common punctuation re-decoded as
# cp1252. Order is part of the contract — all U+20xx artifacts share the
# "â€" prefix, so 3-char sequences are repaired before 2-char ones.
MOJIBAKE: tuple[tuple[str, str], ...] = (
    # U+201D right double quote: its third UTF-8 byte 0x9D is UNDEFINED in
    # cp1252, so lenient decoders emit the C1 control U+009D — repaired
    # here explicitly (and any unrepaired C1 stragglers die in step 4).
    ("â€" + chr(0x9D), '"'),
) + tuple(
    (_cp1252_mojibake(cp), good)
    for cp, good in (
        (0x2019, "'"),    # "â€™"  right single quote
        (0x2018, "'"),    # "â€˜"  left single quote
        (0x201C, '"'),    # "â€œ"  left double quote
        (0x2013, "-"),    # "â€“"  en dash
        (0x2014, "-"),    # "â€”"  em dash
        (0x2026, "..."),  # "â€¦"  ellipsis
        (0xE9, "é"),      # "Ã©"
        (0xE8, "è"),      # "Ã¨"
        (0xE1, "á"),      # "Ã¡"
        (0xF3, "ó"),      # "Ã³"
        (0xFA, "ú"),      # "Ãº"
        (0xF1, "ñ"),      # "Ã±"
        (0xFC, "ü"),      # "Ã¼"
        (0xF6, "ö"),      # "Ã¶"
        (0xE4, "ä"),      # "Ã¤"
        (0xE7, "ç"),      # "Ã§"
        (0xA0, " "),      # "Â "+NBSP → space
    )
)

# Multi-char folds that translate() can't express (1 char → many chars).
FOLDS: tuple[tuple[str, str], ...] = (
    (chr(0x2026), "..."),  # horizontal ellipsis
)

# One translate pass. Fullwidth block U+FF01..U+FF5E maps 1:1 onto ASCII
# 0x21..0x7E by subtracting 0xFEE0.
_FULLWIDTH_FROM = "".join(chr(c) for c in range(0xFF01, 0xFF5F))
_FULLWIDTH_TO = "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F))

# nbsp, en/em/thin space, narrow nbsp, ideographic space → ' '
_SPACES_FROM = "".join(map(chr, (0xA0, 0x2002, 0x2003, 0x2009, 0x202F, 0x3000)))
# curly single/double quotes (incl. low-9 forms) → straight
_QUOTES_FROM = "".join(map(chr, (0x2018, 0x2019, 0x201A, 0x201C, 0x201D, 0x201E)))
_QUOTES_TO = "''," + '"""'
# hyphen/non-breaking-hyphen/figure-dash, en/em dash, minus sign → '-'
_DASHES_FROM = "".join(map(chr, (0x2010, 0x2011, 0x2012, 0x2013, 0x2014, 0x2212)))
# Deleted outright (no counterpart in TRANSLATE_TO): zero-width space /
# non-joiner / joiner, LRM, RLM, word joiner, BOM, soft hyphen.
_DELETE = "".join(map(chr, (0x200B, 0x200C, 0x200D, 0x200E, 0x200F, 0x2060, 0xFEFF, 0xAD)))

TRANSLATE_FROM = _FULLWIDTH_FROM + _SPACES_FROM + _QUOTES_FROM + _DASHES_FROM + _DELETE
TRANSLATE_TO = (
    _FULLWIDTH_TO
    + " " * len(_SPACES_FROM)
    + _QUOTES_TO
    + "-" * len(_DASHES_FROM)
)

# C0 control chars minus \t\n\r, DEL, and the C1 block (never legitimate
# text; C1 stragglers are mostly half-repaired mojibake) — shared
# Java/RE2 subset.
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_unicode(col: Column | str, *, collapse_ws: bool = False) -> Column:
    """Normalized surface form of crawl text (see module note for the
    exact pipeline). NULL-in → NULL-out; 7-bit clean text passes through
    unchanged (modulo ``collapse_ws``)."""
    out = _c(col)
    for bad, good in MOJIBAKE + FOLDS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    out = F.translate(out, TRANSLATE_FROM, TRANSLATE_TO)
    out = F.regexp_replace(out, CONTROL_RE, "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def mojibake_count(col: Column | str) -> Column:
    """Number of cp1252-mojibake artifacts in the raw text (pre-repair
    diagnostic: a high rate flags a systematically mis-decoded source
    worth re-ingesting from bytes instead of patching)."""
    out = F.lit(0)
    for bad, _ in MOJIBAKE:
        out = out + F.regexp_count(_c(col), F.lit(_re_quote(bad)))
    return out.cast("int")


def _sq(s: str) -> str:
    """SQL-string-literal quote (DuckDB: only ' needs doubling)."""
    return s.replace("'", "''")


def _re_quote(s: str) -> str:
    """Escape regex metachars in a literal (shared Java/RE2 subset)."""
    return "".join("\\" + ch if ch in r"\.^$|?*+()[]{}" else ch for ch in s)


def sql_normalize_unicode(expr: str, *, collapse_ws: bool = False) -> str:
    """DuckDB mirror of :func:`normalize_unicode` — identical tables,
    identical order, for the driver's oracle."""
    out = expr
    for bad, good in MOJIBAKE + FOLDS:
        out = f"replace({out}, '{_sq(bad)}', '{_sq(good)}')"
    out = f"translate({out}, '{_sq(TRANSLATE_FROM)}', '{_sq(TRANSLATE_TO)}')"
    out = f"regexp_replace({out}, '{CONTROL_RE}', '', 'g')"
    if collapse_ws:
        out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    return out


def sql_mojibake_count(expr: str) -> str:
    """DuckDB mirror of :func:`mojibake_count`."""
    terms = " + ".join(
        f"len(regexp_extract_all({expr}, '{_sq(_re_quote(bad))}'))"
        for bad, _ in MOJIBAKE
    )
    return f"CAST({terms} AS INT)"
