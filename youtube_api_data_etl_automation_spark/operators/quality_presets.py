"""Published corpus-quality rule presets — Gopher and C4 — as pure
Column math.

The engine's generic funnel (plans/text_queries.corpus_filter_report,
corpus.curate_corpus) takes arbitrary thresholds; what a pretraining
team actually reaches for first are the two NAMED rule sets every
public pipeline reproduces:

- **Gopher quality rules** (Rae et al. 2021, "Scaling Language
  Models: Methods, Analysis & Insights from Training Gopher",
  App. A1.1 — the set reproduced by Dolma/FineWeb/RedPajama): word
  count bounds, mean-word-length bounds, symbol-to-word ratios,
  bullet/ellipsis line ratios, alphabetic-word fraction, required
  stop words. :func:`gopher_flags` emits one boolean per rule plus a
  first-fail verdict, so the funnel report stays attributable.
- **C4 line rules** (Raffel et al. 2020, "Exploring the Limits of
  Transfer Learning…", §2.2): keep lines ending in terminal
  punctuation with ≥ `min_words_per_line` words, drop
  boilerplate-policy and ``javascript`` lines, drop whole pages
  containing ``lorem ipsum`` or ``{``, require a minimum surviving
  line count. :func:`c4_clean` rewrites the text to the surviving
  lines and flags page-level drops.

Both are map-only (split/filter/aggregate higher-order Column ops —
zero Python UDFs, no shuffle), so they compose in front of the dedup
ladder at any scale. Every rule is a plain Column so callers can
re-threshold without forking the preset.

Reference anchor: the reference ETL curates nothing (its transform
block is fetch_youtube_data.py:171-190); these presets are part of
the corpus-curation north star this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Gopher App. A1.1 constants (the published values)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1          # '#' or '…' per word
GOPHER_MAX_BULLET_LINE_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_LINE_RATIO = 0.3
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")
GOPHER_MIN_STOPWORDS = 2

_BULLET_PREFIXES = ("•", "-", "*")  # •, -, *


def _lines(text: Column) -> Column:
    return F.split(F.coalesce(text, F.lit("")), r"\r\n|\r|\n")


def gopher_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the seven Gopher-rule booleans, a ``gopher_verdict``
    first-fail attribution (rule order as published), and
    ``gopher_pass``. Rules:

    ``g_word_count``      50 ≤ words ≤ 100k
    ``g_mean_word_len``   3 ≤ mean word length ≤ 10
    ``g_symbol_ratio``    (# + …) / words ≤ 0.1
    ``g_bullet_lines``    ≤ 90% of lines start with a bullet
    ``g_ellipsis_lines``  ≤ 30% of lines end with an ellipsis
    ``g_alpha_words``     ≥ 80% of words contain a letter
    ``g_stop_words``      ≥ 2 of the 8 required stop words appear
    """
    text = F.col(text_col)
    tok = tokens(text)
    nw = F.size(tok)
    total_len = F.aggregate(
        tok, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_len = F.when(nw > 0, total_len / nw).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(
        F.regexp_replace(text, "#", ""))
    n_ellip = F.length(F.regexp_replace(
        text, r"\.\.\.", "…")) - F.length(F.regexp_replace(
            F.regexp_replace(text, r"\.\.\.", "…"), "…", ""))
    lines = _lines(text)
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(
        lines,
        lambda ln: F.exists(
            F.array(*[F.lit(b) for b in _BULLET_PREFIXES]),
            lambda b: F.trim(ln).startswith(b),
        ),
    ))
    ellipsis_lines = F.size(F.filter(
        lines,
        lambda ln: F.trim(ln).endswith("...")
        | F.trim(ln).endswith("…"),
    ))
    alpha_words = F.size(F.filter(
        tok, lambda t: t.rlike("[a-zA-Z]")))
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.array_contains(tok, s),
    ))

    out = docs.withColumns({
        "g_word_count": (nw >= GOPHER_MIN_WORDS)
        & (nw <= GOPHER_MAX_WORDS),
        "g_mean_word_len": (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN),
        "g_symbol_ratio": F.when(
            nw > 0, (n_hash + n_ellip) / nw <= GOPHER_MAX_SYMBOL_RATIO
        ).otherwise(F.lit(False)),
        "g_bullet_lines": F.when(
            n_lines > 0,
            bullet_lines / n_lines <= GOPHER_MAX_BULLET_LINE_RATIO,
        ).otherwise(F.lit(True)),
        "g_ellipsis_lines": F.when(
            n_lines > 0,
            ellipsis_lines / n_lines <= GOPHER_MAX_ELLIPSIS_LINE_RATIO,
        ).otherwise(F.lit(True)),
        "g_alpha_words": F.when(
            nw > 0, alpha_words / nw >= GOPHER_MIN_ALPHA_WORD_RATIO
        ).otherwise(F.lit(False)),
        "g_stop_words": stop_hits >= GOPHER_MIN_STOPWORDS,
    })
    verdict = (
        F.when(~F.col("g_word_count"), "word_count")
        .when(~F.col("g_mean_word_len"), "mean_word_len")
        .when(~F.col("g_symbol_ratio"), "symbol_ratio")
        .when(~F.col("g_bullet_lines"), "bullet_lines")
        .when(~F.col("g_ellipsis_lines"), "ellipsis_lines")
        .when(~F.col("g_alpha_words"), "alpha_words")
        .when(~F.col("g_stop_words"), "stop_words")
        .otherwise("keep")
    )
    return out.withColumn("gopher_verdict", verdict).withColumn(
        "gopher_pass", F.col("gopher_verdict") == "keep")


C4_MIN_WORDS_PER_LINE = 5
C4_MIN_KEPT_LINES = 3
C4_TERMINAL = (".", "!", "?", '"', "”")  # incl. closing quote
C4_POLICY_PHRASES = ("terms of use", "privacy policy",
                     "cookie policy", "uses cookies")
C4_PAGE_DROP_PHRASES = ("lorem ipsum", "{")


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
             min_kept_lines: int = C4_MIN_KEPT_LINES) -> DataFrame:
    """C4 §2.2 line filtering: keep lines that end in terminal
    punctuation AND have ≥ ``min_words_per_line`` words AND carry
    neither ``javascript`` nor a cookie/policy boilerplate phrase;
    rewrite ``c4_text`` to the surviving lines. Page-level flags:
    ``c4_page_drop`` when the page contains ``lorem ipsum`` / ``{``
    or keeps fewer than ``min_kept_lines`` lines (the published
    3-sentence floor, applied per kept line as the line-oriented
    proxy); ``c4_pass`` = not dropped. Original column untouched."""
    text = F.col(text_col)
    lines = _lines(text)

    def line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        lower = F.lower(t)
        ends_ok = F.exists(
            F.array(*[F.lit(p) for p in C4_TERMINAL]),
            lambda p: t.endswith(p),
        )
        words_ok = F.size(F.split(t, r"\s+")) >= min_words_per_line
        no_js = ~lower.contains("javascript")
        no_policy = ~F.exists(
            F.array(*[F.lit(p) for p in C4_POLICY_PHRASES]),
            lambda p: lower.contains(p),
        )
        return ends_ok & words_ok & no_js & no_policy

    kept = F.filter(lines, line_ok)
    lower_text = F.lower(F.coalesce(text, F.lit("")))
    page_phrase_drop = F.exists(
        F.array(*[F.lit(p) for p in C4_PAGE_DROP_PHRASES]),
        lambda p: lower_text.contains(p),
    )
    return docs.withColumns({
        "c4_text": F.concat_ws("\n", kept),
        "c4_kept_lines": F.size(kept),
        "c4_page_drop": page_phrase_drop
        | (F.size(kept) < min_kept_lines),
    }).withColumn("c4_pass", ~F.col("c4_page_drop"))
