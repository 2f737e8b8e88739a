"""HTML/markup boilerplate stripping for web-corpus curation.

Raw web crawl text arrives as HTML; the first curation step (before
language ID, quality scoring, dedup) is reducing it to visible text. This
is the C4/CommonCrawl-style tag scrub as pure Column expressions —
JVM-side, codegen'd, zero Python on the data path — written (like
functions/pii.py) in the regex subset Java's engine and DuckDB's RE2
interpret identically: no backreferences (script and style get separate
patterns instead of a ``<(script|style)>.*?</\\1>`` backref), no
lookaround, embedded ``(?is)`` flags only.

Pipeline order is part of the contract:

1. drop <script>/<style> elements WITH their contents (non-greedy dotall;
   unterminated blocks are left for the tag pass rather than eating the
   rest of the document),
2. drop <!-- comments -->,
3. strip remaining tags (naive ``<[^>]*>`` — a bare '<' with a later '>'
   in prose is consumed, the classic deterministic-stripper trade),
4. decode the named entities, ``&amp;`` LAST so ``&amp;lt;`` single-decodes
   to ``&lt;`` (and, because decode runs after tag removal, markup that
   arrived entity-escaped stays visible text instead of becoming tags),
5. collapse whitespace runs and trim.

At 100 TB this is a map-only projection: no shuffle, linear scan, and the
stripped column ships in the same scan-to-sink pass as the PII scrub.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared Java/RE2 subset (see module note). Two element patterns because
# RE2 has no backreferences.
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
TAG_RE = r"(?s)<[^>]*>"

_BLOCK_RES: tuple[str, ...] = (SCRIPT_RE, STYLE_RE, COMMENT_RE, TAG_RE)

# Decode order is part of the contract: &amp; last (single-decode).
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tag_count(col: Column | str) -> Column:
    """Number of markup tags in the raw text (pre-strip diagnostic: a
    high tag density is itself a boilerplate quality signal)."""
    return F.regexp_count(_c(col), F.lit(TAG_RE)).cast("int")


def strip_markup(col: Column | str) -> Column:
    """Visible text of an HTML/markup string (see module note for the
    exact pipeline). NULL-in → NULL-out; markup-free text passes through
    with only whitespace normalization."""
    out = _c(col)
    for pattern in _BLOCK_RES:
        out = F.regexp_replace(out, pattern, " ")
    for entity, ch in ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def sql_strip_markup(expr: str) -> str:
    """DuckDB mirror of :func:`strip_markup` — identical patterns,
    identical order, for the driver's oracle."""
    # DuckDB string literals do NOT treat backslash as an escape, so the
    # regex text goes in verbatim; only quotes need doubling.
    out = expr
    for pattern in _BLOCK_RES:
        sql_pat = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', ' ', 'g')"
    for entity, ch in ENTITIES:
        sql_ch = ch.replace("'", "''")
        sql_ent = entity.replace("'", "''")
        out = f"replace({out}, '{sql_ent}', '{sql_ch}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def sql_tag_count(expr: str) -> str:
    """DuckDB mirror of :func:`tag_count`."""
    sql_pat = TAG_RE.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{sql_pat}')) AS INT)"
