"""robots.txt parsing and REP allow/deny evaluation — crawl-corpus
provenance compliance, JVM-side.

A training-data pipeline built on crawl data needs to answer "was this
URL crawlable for agent X?" retroactively — per-host robots.txt
snapshots ride next to the corpus and opt-outs must be honored at
curation time, not just at crawl time. This module implements the
Robots Exclusion Protocol (RFC 9309 / the public Google REP draft
semantics) as DataFrame ops:

- :func:`parse_robots` — per-host robots.txt payloads → one row per
  directive with RFC group structure recovered (consecutive
  ``User-agent`` lines share the following rules; comments stripped;
  unknown lines ignored). Pure Column math over ``posexplode`` +
  windows — the only shuffle keys on ``host``.
- :func:`filter_robots_allowed` — URL table × rules → allowed rows,
  with the full REP decision: the most specific matching agent group
  wins (a named group shadows ``*``), longest-pattern match decides,
  ``allow`` wins ties, ``*`` wildcards and ``$`` end anchors
  supported, no match ⇒ allowed. The per-host rule set folds to ONE
  array row, the corpus side joins on host (hash join — the rules
  relation is host-sized, not corpus-sized) and the decision is a
  map-side ``aggregate`` fold per row: the corpus never shuffles.
- :func:`robots_crawl_delays` / :func:`robots_sitemaps` — the two
  non-rule directives, as plain selects.

Reference anchor: the reference pipeline consumes a public API
(fetch_youtube_data.py:74-96) and never crawls, but the north-star
corpus this engine curates is crawl-shaped (corpus.warc_to_documents);
robots compliance is the provenance filter that corpus needs.

Scale: parsing is linear in robots bytes (tiny next to any corpus);
the decision join is corpus-rows × ≤rules-per-host with no
quadratic term — REP files are small (the de-facto cap is 500 KiB,
RFC 9309 §2.5) and the regex per rule is compiled from a bounded
pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.colcache import name_memo

_RULE_TYPES = ("user-agent", "allow", "disallow", "crawl-delay",
               "sitemap")


def parse_robots(df: DataFrame, host_col: str = "host",
                 payload_col: str = "payload") -> DataFrame:
    """robots.txt payloads → ``(host, agent, rule_type, value)`` rows.

    ``payload`` may be binary (decoded as ISO-8859-1 — total, byte-
    preserving, and exact for the ASCII these files are in practice)
    or string. Directives are matched case-insensitively; ``#``
    comments and unknown lines are dropped; rule values keep their
    case (REP paths are case-sensitive). Group recovery per RFC 9309:
    one or more consecutive ``User-agent`` lines open a group and the
    following allow/disallow/crawl-delay lines belong to EVERY agent
    of that group (emitted once per agent); rules before any
    ``User-agent`` line are ignored; ``Sitemap`` is group-independent
    and carries a NULL agent.

    A leading UTF-8 BOM is stripped before line parsing (BOM-prefixed
    robots.txt is common; without the strip the first directive would
    silently fail the key match — r12 review fix). Multiple payload
    rows for the SAME host each parse independently — group recovery
    is keyed by (host, payload hash), never interleaved across
    payloads (r12 review fix); the emitted rules are the union, so
    pick one capture per host upstream (as
    :func:`warc_robots_rules` does) when snapshot-exact semantics
    matter. Identical duplicate payloads are deduplicated."""
    is_binary = dict(df.dtypes)[payload_col] == "binary"
    # every Column fragment is memoized per (column names, dtype) —
    # r14 construct-latency trim: two parses per url_compliance
    # construct rebuilt identical trees (functions/colcache.py)
    (text, pos_line, key, value, key_filter, gid, is_ua, agents_agg,
     rule_cols, sitemap_cols) = _parse_robots_frags(
        host_col, payload_col, is_binary)
    # identical duplicate payloads dedupe BEFORE the explode — one
    # shuffled row per capture, not per robots line (r12 review fix)
    uniq = df.select(
        F.col(host_col).alias("host"),
        F.xxhash64(F.col(payload_col)).alias("src"),
        text.alias("_text"),
    ).dropDuplicates(["host", "src"])
    lines = uniq.select("host", "src", pos_line)
    parsed = lines.select(
        "host", "src", "pos", key, value,
    ).filter(key_filter)
    grouped = parsed.select("host", "src", "pos", "key", "value", gid)

    agents = (
        grouped.filter(is_ua)
        .groupBy("host", "src", "gid")
        .agg(agents_agg)
    )
    rules = (
        grouped.filter(~is_ua & (F.col("key") != "sitemap")
                       & (F.col("gid") > 0))
        .join(agents, ["host", "src", "gid"])
        .select(*rule_cols)
    )
    sitemaps = grouped.filter(F.col("key") == "sitemap") \
        .select(*sitemap_cols)
    return rules.unionByName(sitemaps)


@name_memo
def _parse_robots_frags(host_col: str, payload_col: str,
                        is_binary: bool) -> tuple:
    """Every Column fragment of :func:`parse_robots`, memoized (r14 —
    see functions/colcache.py). Expression-identical to the former
    inline builds; the url_compliance_docs oracle row pins the
    values."""
    text = F.col(payload_col)
    if is_binary:
        text = F.decode(text, "ISO-8859-1")
    # the BOM is U+FEFF on pre-decoded strings and the three-char
    # ISO-8859-1 rendering of EF BB BF on decoded binary payloads
    text = F.regexp_replace(
        text, "^(\uFEFF|\u00EF\u00BB\u00BF)", "")
    pos_line = F.posexplode(
        F.split(F.col("_text"), r"\r\n|\r|\n")).alias("pos", "line")
    stripped = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(stripped, "^([^:]*):", 1))) \
        .alias("key")
    value = F.trim(F.regexp_extract(stripped, "^[^:]*:(.*)$", 1)) \
        .alias("value")
    key_filter = F.col("key").isin(*_RULE_TYPES)
    w = Window.partitionBy("host", "src").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    new_group = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    gid = F.sum(new_group.cast("int")).over(w).alias("gid")
    agents_agg = F.collect_set(F.lower(F.col("value"))).alias("agents")
    rule_cols = (
        "host",
        F.explode("agents").alias("agent"),
        F.col("key").alias("rule_type"),
        "value",
    )
    sitemap_cols = (
        "host",
        F.lit(None).cast("string").alias("agent"),
        F.lit("sitemap").alias("rule_type"),
        "value",
    )
    return (text, pos_line, key, value, key_filter, gid, is_ua,
            agents_agg, rule_cols, sitemap_cols)


def _rule_regex(value: Column) -> Column:
    """REP pattern → anchored Java regex, as Column math: regex
    metacharacters escaped, ``*`` → ``.*``, a trailing ``$`` becomes
    the anchor (anywhere else ``$`` is literal)."""
    ends_anchored = value.endswith("$")
    body = F.when(ends_anchored,
                  value.substr(F.lit(1), F.length(value) - 1)) \
        .otherwise(value)
    escaped = F.regexp_replace(
        body, r"([.\\+?(){}\[\]^$|])", r"\\$1")
    pattern = F.regexp_replace(escaped, r"\*", ".*")
    return F.concat(F.lit("^"), pattern,
                    F.when(ends_anchored, F.lit("$"))
                    .otherwise(F.lit("")))


@name_memo
def robots_match_target(url: Column | str) -> Column:
    """The string REP rules match against: the URL's path (``/`` when
    empty) plus the ``?query`` when present — fragments excluded."""
    from ..functions.urls import url_path

    path = url_path(url)
    query = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    return F.concat(
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query != "", F.concat(F.lit("?"), query))
        .otherwise(F.lit("")),
    )


@name_memo
def _rep_decision(url_col: str, rset_col: str = "__rset") -> Column:
    """The map-side REP verdict for one row: fold the row's governing
    rule array (``rset_col``, default ``__rset``) tracking the longest
    matching rule, allow winning exact ties; no match ⇒ allowed. Pure
    function of the URL/rule-array column NAMES, so the (large) fold
    tree builds once per process (r14 construct-latency memo — see
    functions/colcache.py). The fold is order-independent (longest
    match wins, allow wins exact ties regardless of visit order), so
    callers may feed it any collect_list rule order — the r15 fused
    two-agent evaluation relies on this."""
    target = robots_match_target(url_col)
    return F.aggregate(
        F.coalesce(F.col(rset_col),
                   F.array().cast(
                       "array<struct<l:int,is_allow:boolean,rx:string>>")),
        F.struct(F.lit(-1).alias("best"),
                 F.lit(True).alias("allow")),
        lambda acc, rule: F.when(
            F.regexp_like(target, rule["rx"])
            & ((rule["l"] > acc["best"])
               | ((rule["l"] == acc["best"]) & rule["is_allow"]
                  & ~acc["allow"])),
            F.struct(rule["l"].alias("best"),
                     rule["is_allow"].alias("allow")),
        ).otherwise(acc),
        lambda acc: acc["allow"],
    )


@name_memo
def _rep_scoped_cols(agent_lc: str) -> tuple[Column, Column, Column]:
    """(filter, specific, rule-struct) fragments of the rules-side
    projection in :func:`filter_robots_allowed`, memoized per agent."""
    flt = (F.col("agent").isin(agent_lc, "*")
           & (F.col("rule_type") != "sitemap"))
    specific = (F.col("agent") == agent_lc).alias("specific")
    rule = F.when(
        F.col("rule_type").isin("allow", "disallow")
        & (F.col("value") != ""),
        F.struct(
            F.length("value").alias("l"),
            (F.col("rule_type") == "allow").alias("is_allow"),
            _rule_regex(F.col("value")).alias("rx"),
        ),
    ).alias("rule")
    return flt, specific, rule


@name_memo
def _rep_per_host_cols() -> tuple[Column, Column, Column, Column]:
    """The per-host rule-set aggregation fragments (agent-independent)."""
    return (
        F.max(F.col("specific")).alias("has_named"),
        F.collect_list(F.when(F.col("specific"), F.col("rule")))
        .alias("spec_rules"),
        F.collect_list(F.when(~F.col("specific"), F.col("rule")))
        .alias("star_rules"),
        F.when(F.col("has_named"), F.col("spec_rules"))
        .otherwise(F.col("star_rules")).alias("__rset"),
    )


def filter_robots_allowed(urls: DataFrame, rules: DataFrame,
                          agent: str = "*", url_col: str = "url",
                          keep_disallowed: bool = False) -> DataFrame:
    """Keep the URL rows the given agent may fetch under the parsed
    robots rules (:func:`parse_robots` output). REP decision per RFC
    9309 §2.2: the group for the requested agent (falling back to the
    ``*`` group only when no named group exists for that host), the
    longest matching pattern wins, ``allow`` wins length ties, hosts
    with no rules — and rows whose URL has no host — are allowed.

    ``keep_disallowed=True`` inverts the filter (the audit view: what
    WOULD be dropped). Plan: per-host rule arrays (one groupBy on the
    tiny rules relation), corpus joins on host (hash join) and decides
    map-side with an ``aggregate`` fold calling ``regexp_like`` per
    rule — no corpus shuffle, no pair blowup."""
    from ..functions.urls import url_host

    agent_lc = agent.lower()
    # every Column fragment below is memoized per (agent, url column
    # NAME) — r14: three REP evaluations per url_compliance construct
    # were rebuilding ~6k py4j round-trips of identical trees
    flt, specific, rule = _rep_scoped_cols(agent_lc)
    scoped = rules.filter(flt).select("host", specific, rule)
    # group exclusivity is judged on ANY named-group directive — an
    # empty-value Disallow or a crawl-delay-only named group still
    # shadows the * group (RFC 9309; r12 review fix — size(spec_rules)
    # alone would leak * rules into such groups)
    has_named, spec_rules, star_rules, rset = _rep_per_host_cols()
    per_host = scoped.groupBy("host").agg(
        has_named, spec_rules, star_rules,
    ).select(
        "host",
        # '__'-prefixed like the host keys: a caller URL table owning a
        # plain 'rset' column must survive the join + drop (r13 ADVICE)
        rset,
    )

    # the rules-side key is renamed before the join: drop("host") by
    # NAME after an equi-join would also remove a caller-owned 'host'
    # column from the URL table (r12 review fix)
    per_host = per_host.withColumnRenamed("host", "__rules_host")
    with_host = urls.withColumn("__rhost", url_host(url_col))
    joined = with_host.join(
        per_host, with_host["__rhost"] == per_host["__rules_host"],
        "left",
    ).drop("__rules_host")
    # fold: track the longest matching rule; allow wins exact ties
    out = joined.withColumn("__allowed", _rep_decision(url_col))
    keep = ~F.col("__allowed") if keep_disallowed else F.col("__allowed")
    return out.filter(keep).drop("__rhost", "__rset", "__allowed")


def robots_crawl_delays(rules: DataFrame,
                        agent: str = "*") -> DataFrame:
    """``(host, crawl_delay_sec)`` for the agent. Group-exclusive like
    the allow/deny path (r12 review fix): when a NAMED group exists
    for the host — judged on ANY of its directives, not just delays —
    only that group's delay counts, even if it sets none (the ``*``
    group's delay must not leak in); ``*`` applies only to hosts with
    no named group. Unparseable delays drop; hosts whose governing
    group sets no delay emit no row."""
    # fragments memoized per agent (r14 construct-latency trim —
    # four evaluations per url_compliance construct)
    flt, specific, delay, aggs, pick = _delay_frags(agent.lower())
    scoped = rules.filter(flt).select("host", specific, delay)
    return (
        scoped.groupBy("host")
        .agg(*aggs)
        .select("host", pick)
        .filter(F.col("crawl_delay_sec").isNotNull())
    )


@name_memo
def _delay_frags(agent_lc: str) -> tuple:
    """Column fragments of :func:`robots_crawl_delays`, memoized —
    expression-identical to the former inline builds."""
    flt = (F.col("agent").isin(agent_lc, "*")
           & (F.col("rule_type") != "sitemap"))
    specific = (F.col("agent") == agent_lc).alias("specific")
    delay = F.when(
        F.col("rule_type") == "crawl-delay",
        F.col("value").try_cast("double"),
    ).alias("delay")
    aggs = (
        F.max(F.col("specific")).alias("has_named"),
        F.max(F.when(F.col("specific"), F.col("delay")))
        .alias("named_delay"),
        F.max(F.when(~F.col("specific"), F.col("delay")))
        .alias("star_delay"),
    )
    pick = F.when(F.col("has_named"), F.col("named_delay")) \
        .otherwise(F.col("star_delay")).alias("crawl_delay_sec")
    return flt, specific, delay, aggs, pick


def robots_sitemaps(rules: DataFrame) -> DataFrame:
    """Distinct ``(host, sitemap_url)`` pairs."""
    return (
        rules.filter(F.col("rule_type") == "sitemap")
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


_XML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&"))  # &amp; LAST


def _xml_unescape(col: Column) -> Column:
    # sitemap <loc> values escape the five XML entities; &amp; must be
    # decoded last so '&amp;lt;' round-trips as '&lt;'
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemaps(df: DataFrame, host_col: str = "host",
                   payload_col: str = "payload") -> DataFrame:
    """Sitemap XML payloads → ``(host, kind, url, lastmod)`` rows —
    the companion of :func:`robots_sitemaps`, closing the loop from a
    robots ``Sitemap:`` pointer to the URL inventory it names.

    ``kind`` is ``urlset`` (leaf sitemap) or ``sitemapindex`` (its
    entries are further sitemap URLs). Parsing is pure Column math:
    the document splits on ``</url>``/``</sitemap>`` block ends, each
    block yields its ``<loc>`` (XML entities decoded — ``&amp;`` is
    ubiquitous in real sitemap URLs) and optional ``<lastmod>``.
    Sitemaps are machine-generated with this exact shape (the
    sitemaps.org schema), so regexp extraction is sound here in a way
    it would not be for general XML; payloads without a recognizable
    root element yield no rows. Map-only — the explode stays in the
    source partition."""
    is_binary = dict(df.dtypes)[payload_col] == "binary"
    kind, block, url, lastmod = _parse_sitemaps_frags(
        host_col, payload_col, is_binary)
    return (
        df.select(F.col(host_col).alias("host"), kind, block)
        .filter(F.col("kind").isNotNull())
        .select("host", "kind", url, lastmod)
        .filter(F.col("url") != "")
    )


@name_memo
def _parse_sitemaps_frags(host_col: str, payload_col: str,
                          is_binary: bool) -> tuple:
    """Column fragments of :func:`parse_sitemaps`, memoized (r14) —
    expression-identical to the former inline builds."""
    text = F.col(payload_col)
    if is_binary:
        text = F.decode(text, "ISO-8859-1")
    kind = (
        F.when(text.contains("<sitemapindex"), F.lit("sitemapindex"))
        .when(text.contains("<urlset"), F.lit("urlset"))
    ).alias("kind")
    block = F.explode(
        F.split(text, "</url>|</sitemap>")).alias("block")
    loc = F.regexp_extract(F.col("block"),
                           r"<loc>\s*([^<]*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(F.col("block"),
                               r"<lastmod>\s*([^<]*?)\s*</lastmod>", 1)
    return (
        kind, block,
        _xml_unescape(loc).alias("url"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
    )


def warc_robots_rules(blobs: DataFrame) -> DataFrame:
    """WARC payload table → parsed robots rules: the crawl snapshot's
    own ``/robots.txt`` captures (2xx HTTP responses whose target URI
    path is exactly ``/robots.txt``) feed :func:`parse_robots`, keyed
    by the capture's host — so the allow/deny filter runs against the
    robots state AS CRAWLED, not a later fetch. When a host was
    captured more than once, ONE capture wins — the last in collection
    order (max (doc_id, record_idx)) — so the parsed rules reflect one
    coherent snapshot rather than a union of captures (r12 review
    fix). One in-partition WARC split, a per-host max_by, then the
    parser's host-keyed windows."""
    from ..functions.urls import url_host, url_path

    from .archives import warc_records

    recs = warc_records(blobs, errors="quarantine")
    robots = (
        recs.filter(
            (F.col("warc_type") == "response")
            & F.col("http_status").between(200, 299)
            & (url_path("target_uri") == "/robots.txt")
            & F.col("body").isNotNull()
        )
        .select(
            url_host("target_uri").alias("host"),
            F.col("body").alias("payload"),
            F.struct("doc_id", "record_idx").alias("ord"),
        )
        .filter(F.col("host") != "")
        .groupBy("host")
        .agg(F.expr("max_by(payload, ord)").alias("payload"))
    )
    return parse_robots(robots)


def crawl_frontier(rules: DataFrame, sitemap_fetches: DataFrame, *,
                   agent: str = "*", seen: DataFrame | None = None,
                   url_col: str = "url",
                   payload_col: str = "payload") -> DataFrame:
    """Provenance-complete crawl seed list (r13): compose the REP
    surface end-to-end — ``Sitemap:`` pointers from the parsed robots
    rules select which fetched sitemap payloads to trust, those parse
    to URL rows (one ``sitemapindex`` indirection level resolved
    against the same fetch table — the standard two-level shape),
    every URL canonicalizes through :func:`~..functions.urls.
    url_normalize`, the crawling ``agent``'s own robots rules filter
    them, and URLs already ingested (``seen``, any table with
    ``url_col``) subtract out. Returns distinct
    ``(host, url, lastmod, crawl_delay_sec)`` rows — host re-derived
    from the CANONICAL URL (sitemaps may name cross-host URLs; the
    REP decision and the frontier key both belong to the URL's own
    host), lastmod the max across sitemap mentions, and
    ``crawl_delay_sec`` (r14, nullable) the agent's governing
    ``Crawl-delay`` for that host via :func:`robots_crawl_delays` —
    the politeness metadata a fetcher consuming the frontier needs,
    joined here so it never has to re-derive it (VERDICT r13 item 2).

    ``sitemap_fetches`` is the caller's fetch table
    ``(url, payload)`` — payloads are joined back to the robots
    pointers by URL, so a sitemap nobody's robots.txt names
    contributes nothing (the provenance property: every frontier row
    traces to a robots pointer for its snapshot).

    Scale: pointers/sitemaps are rules-sized (KBs per host) — every
    join before the final two is tiny-side hash; the ``seen``
    anti-join is the only corpus-sized edge and it shuffles canonical
    URL strings, never documents. The robots decision is the
    map-side fold of :func:`filter_robots_allowed`."""
    from ..functions.urls import url_host, url_normalize

    pointers = robots_sitemaps(rules).withColumn(
        "__smu", url_normalize("sitemap_url"))
    # the fetch table's URL column is fixed at 'url' per the documented
    # (url, payload) contract; url_col names only the SEEN table's
    # column (r13 review fix — applying url_col here made a seen table
    # with a non-'url' column impossible to subtract)
    fetched = sitemap_fetches.select(
        url_normalize("url").alias("__smu"),
        F.col(payload_col).alias("__payload"),
    ).dropDuplicates(["__smu"])

    def _parse(ptrs: DataFrame) -> DataFrame:
        return parse_sitemaps(
            ptrs.join(fetched, "__smu").select("host", "__payload"),
            host_col="host", payload_col="__payload")

    # consumed by BOTH union branches (leaf rows + the index
    # indirection) — persist() so composition stays plan-only and the
    # parse runs once per action; the relation is rules-sized
    # (r13 review fixes: without this the first-level join+parse ran
    # twice per job; an eager checkpoint ran jobs at build time.
    # r15: was a LAZY localCheckpoint — whose eager toRdd conversion
    # physically planned the whole subtree at BUILD time, ~0.8 s per
    # construct at sf0.1; persist() keeps the run-once materialization
    # and moves planning into the action where it happens once anyway)
    first = _parse(pointers.select("host", "__smu")).persist()
    # one sitemapindex indirection: its entries are further sitemap
    # URLs, resolved against the same fetch table (deeper nesting is
    # out of the sitemaps.org contract for a single index file)
    leaf = first.filter(F.col("kind") == "urlset")
    idx = first.filter(F.col("kind") == "sitemapindex").select(
        "host", url_normalize("url").alias("__smu")
    ).dropDuplicates(["host", "__smu"])
    second = _parse(idx).filter(F.col("kind") == "urlset")
    urls = leaf.unionByName(second).select(
        url_normalize("url").alias("url"), "lastmod")

    allowed = filter_robots_allowed(urls, rules, agent=agent)
    if seen is not None:
        seen_urls = seen.select(
            url_normalize(url_col).alias("url")).distinct()
        allowed = allowed.join(seen_urls, "url", "left_anti")
    # host-keyed left join of the agent's governing Crawl-delay: the
    # delays relation is rules-sized (≤1 row per host) — broadcast
    # hash, never a corpus shuffle; hosts whose governing group sets
    # no delay stay NULL (the fetcher's default applies)
    delays = robots_crawl_delays(rules, agent=agent)
    return (
        allowed.groupBy("url")
        .agg(F.max("lastmod").alias("lastmod"))
        .select(url_host("url").alias("host"), "url", "lastmod")
        .join(F.broadcast(delays), "host", "left")
    )


def schedule_fetches(frontier: DataFrame, slots: int, *,
                     default_delay_sec: float = 1.0) -> DataFrame:
    """Politeness-aware fetch plan over a :func:`crawl_frontier`
    relation: assign every URL a worker ``slot`` and a host-local
    ``not_before_sec`` offset honoring the host's ``crawl_delay_sec``.

    - ``slot = pmod(xxhash64(host), slots)`` — ALL of a host's URLs
      land on one worker, so per-host delays can be enforced locally
      without cross-worker coordination (the standard
      politeness-partitioned fetcher shape).
    - ``seq`` — the URL's 0-based position within its host (ordered
      by canonical URL: deterministic, re-runs produce the same
      schedule).
    - ``not_before_sec = seq * coalesce(crawl_delay_sec,
      default_delay_sec)`` — the earliest offset (seconds from the
      host's first fetch) at which the fetch respects the delay.

    Scale: one window partitioned by ``host`` — fine at crawl scale
    because host cardinality is high and per-host URL counts are
    sitemap-bounded (50k per urlset); no host's partition approaches
    executor memory. No global sort, no driver collect.
    """
    if slots <= 0:
        # pmod(x, 0) is NULL under non-ANSI Spark — every row would
        # land in one NULL bucket instead of failing fast (r14 review)
        raise ValueError(f"schedule_fetches: slots={slots} must be > 0")
    w = Window.partitionBy("host").orderBy("url")
    delay = F.coalesce(F.col("crawl_delay_sec"),
                       F.lit(float(default_delay_sec)))
    return frontier.select(
        "*",
        F.pmod(F.xxhash64(F.col("host")), F.lit(slots))
        .cast("int").alias("slot"),
        (F.row_number().over(w) - F.lit(1)).alias("seq"),
    ).withColumn("not_before_sec", F.col("seq") * delay)
