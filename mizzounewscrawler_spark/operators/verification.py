"""URL verification stage (F3/F4/F5/F9/F10/U4 — the discovered→article
status transition the reference runs between discovery and extraction).

Reference semantics being re-expressed:
- ``check_is_article`` chain (/root/reference/src/pipeline/url_filters.py:51-131):
  normalize → blocklist paths (/search/, /author/, /feed/, file extensions,
  /video/, /podcast/ …) → allowlist regexes (/stories?/, date paths
  ``/\\d{4}/\\d{1,2}/\\d{1,2}/``, /news/…, long numeric ids) → StorySniffer
  fallback on survivors.
- verification outcome → status ∈ {article, not_article, wire}
  (/root/reference/src/services/url_verification.py:676-703).
- wire-URL prefilter (F9): wire_services url patterns
  (/root/reference/src/services/url_verification.py:487-521).
- shortener / non-news-domain predicates (F5)
  (/root/reference/src/mcmetadata/urls.py:381-435).
- dynamic url_path_filters table (F4)
  (/root/reference/src/services/url_verification.py:253-329): regex rows
  loaded from a table — here a broadcast-collected dimension folded into
  the same column expression.
- site-spec skip (F10) (/root/reference/src/pipeline/site_filters.py:88-131):
  per-host token lists from a spec table.

Everything is a single whole-stage-codegen'd ``when`` ladder — the chain
runs in one pass over the URLs with no Python.  The StorySniffer stub (U4)
is a deterministic md5-parity rule, chosen to be expressible in BOTH Spark
and ANSI SQL so the whole chain is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# F3 blocklist (url_filters.py:51-131 panels, collapsed to one alternation)
BLOCKLIST_RE = (
    r"(?i)(/(search|author|feed|tag|category|topics?|video|podcast|gallery|"
    r"photos?|classifieds?|jobs|weather|staff|about|contact|subscribe|"
    r"newsletters?)(/|$))|\.(jpe?g|png|gif|pdf|mp[34]|zip|css|js)$"
)
# F3 allowlist: story paths, date paths, /news/ sections, long numeric ids
ALLOWLIST_RE = (
    r"(?i)(/stor(y|ies)/|/news/.+|/\d{4}/\d{1,2}/\d{1,2}/|-\d{3,}(\.html?)?$|"
    r"/article[s]?/)"
)
# F9 wire-URL patterns (wire_services table seeds, pattern_type='url')
WIRE_URL_RE = r"(?i)(apnews\.com|reuters\.com|/wire[s]?/|/ap-|/national/ap/)"
# F5 shortener hosts + non-news domain suffixes (mcmetadata/urls.py:381-435)
SHORTENER_HOSTS = ("bit.ly", "t.co", "tinyurl.com", "goo.gl", "ow.ly", "buff.ly")
NON_NEWS_SUFFIXES = (
    "facebook.com", "twitter.com", "x.com", "youtube.com", "instagram.com",
    "pinterest.com", "linkedin.com", "reddit.com", "wikipedia.org",
)

SNIFFER_ARTICLE_CHARS = "02468ace"  # even hex nibbles → "looks like a story"

# F2: the crawler-side default substring skip list — plain lowercase
# substring containment, NOT regex (reference _is_likely_article,
# /root/reference/src/crawler/__init__.py:468-516, full 25-entry list)
CRAWLER_SKIP_SUBSTRINGS = (
    "/show", "/podcast", "/category", "/tag", "/author", "/page/", "/search",
    "/login", "/register", "/contact", "/about", "/privacy", "/terms",
    "/sitemap", "/posterboard-ads/", "/classifieds/", "/marketplace/",
    "/deals/", "/coupons/", "/promotions/", "/sponsored/",
)


def sniffer_guess_expr(url: Column) -> Column:
    """U4 StorySniffer stub: a deterministic predict-UDF stand-in.

    The real model is an ML URL classifier (reference url_verification.py:569);
    this container has no model, so the stub derives a stable pseudo-label
    from md5(url) parity — deterministic across runs/parallelism AND
    mirrorable in DuckDB SQL, which makes the full verification chain
    oracle-checkable.  Swap for a broadcast model + pandas_udf in production.
    """
    return F.substring(F.md5(url), 1, 1).isin(*SNIFFER_ARTICLE_CHARS)


def _host_expr(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^https?://([^/]+)", 1))


def verify_status_expr(
    url: Column,
    dynamic_exclude_re: str | None = None,
    dynamic_include_re: str | None = None,
) -> Column:
    """The F3 chain as one ordered expression → {article, not_article, wire}.

    ``dynamic_*_re`` are the F4 url_path_filters table rows collapsed into
    alternations (exclude beats include, both beat the static panels —
    reference checks dynamic patterns first, url_verification.py:253-329).
    """
    u = F.coalesce(url, F.lit(""))
    host = _host_expr(u)
    bare = F.regexp_replace(host, r"^www\.", "")
    non_news = None
    for suf in NON_NEWS_SUFFIXES:
        cond = bare == suf
        cond = cond | bare.endswith("." + suf)
        non_news = cond if non_news is None else (non_news | cond)
    shortener = bare.isin(*SHORTENER_HOSTS)

    expr = F.when(shortener | non_news, F.lit("not_article"))
    if dynamic_exclude_re:
        expr = expr.when(u.rlike(dynamic_exclude_re), F.lit("not_article"))
    if dynamic_include_re:
        expr = expr.when(u.rlike(dynamic_include_re), F.lit("article"))
    return (
        expr.when(u.rlike(WIRE_URL_RE), F.lit("wire"))
        .when(u.rlike(BLOCKLIST_RE), F.lit("not_article"))
        .when(u.rlike(ALLOWLIST_RE), F.lit("article"))
        .when(sniffer_guess_expr(u), F.lit("article"))
        .otherwise(F.lit("not_article"))
    )


def collapse_dynamic_filters(patterns: DataFrame) -> tuple[str | None, str | None]:
    """F4: fold the active rows of a url_path_filters table into (exclude_re,
    include_re) alternations.  The table is a dimension (hundreds of rows);
    collecting it driver-side mirrors the reference's TTL cache and keeps
    the chain a pure column expression."""
    rows = (
        patterns.where(F.col("active"))
        .select("pattern", "filter_type")
        .collect()
    )
    exc = [r["pattern"] for r in rows if r["filter_type"] == "exclude"]
    inc = [r["pattern"] for r in rows if r["filter_type"] == "include"]
    join = lambda ps: ("(?i)(" + "|".join(ps) + ")") if ps else None  # noqa: E731
    return join(exc), join(inc)


def likely_article_expr(
    url: Column,
    include_tokens: Column | None = None,
    exclude_tokens: Column | None = None,
) -> Column:
    """F2 ``_is_likely_article`` (reference __init__.py:468-516) as one
    boolean column expression:

    1. default substring blocklist (CRAWLER_SKIP_SUBSTRINGS, lowercase
       containment) rejects known non-article paths;
    2. per-site include tokens: when the (broadcast-joined) array is
       non-empty the URL must contain at least one;
    3. per-site exclude tokens: the URL must contain none.

    ``include_tokens``/``exclude_tokens`` are array<string> columns from the
    site-rules dimension (null ⇒ no rule ⇒ pass)."""
    u = F.lower(F.coalesce(url, F.lit("")))
    block: Column | None = None
    for s in CRAWLER_SKIP_SUBSTRINGS:
        c = u.contains(s)
        block = c if block is None else (block | c)
    keep = ~block
    if include_tokens is not None:
        keep = keep & (
            include_tokens.isNull()
            | (F.size(include_tokens) == 0)
            | F.exists(include_tokens, lambda t: u.contains(F.lower(t)))
        )
    if exclude_tokens is not None:
        keep = keep & (
            exclude_tokens.isNull()
            | ~F.exists(exclude_tokens, lambda t: u.contains(F.lower(t)))
        )
    return keep


def filter_likely_articles(
    candidates: DataFrame,
    site_rules: DataFrame | None = None,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """F2 applied to a candidate table: keep rows ``likely_article_expr``
    accepts.  ``site_rules`` is the per-host rule dimension
    (host, include_patterns array<string>, exclude_patterns array<string>)
    — #hosts-sized, broadcast (the reference loads it per site from its
    site-rules store, __init__.py:501-515)."""
    if site_rules is None:
        return candidates.where(likely_article_expr(F.col(url_col)))
    rules = site_rules.select(
        F.col("host").alias("_f2_host"),
        F.col("include_patterns").alias("_f2_inc"),
        F.col("exclude_patterns").alias("_f2_exc"),
    )
    return (
        candidates.join(
            F.broadcast(rules), candidates[host_col] == rules["_f2_host"], "left"
        )
        .where(
            likely_article_expr(
                F.col(url_col), F.col("_f2_inc"), F.col("_f2_exc")
            )
        )
        .drop("_f2_host", "_f2_inc", "_f2_exc")
    )


def site_spec_skip_expr(url: Column, tokens: Column) -> Column:
    """F10 ``should_skip``: any spec token substring-matches the URL
    (site_filters.py:88-131).  ``tokens`` is the broadcast-joined
    array<string> column (null ⇒ no spec ⇒ keep)."""
    return F.when(
        tokens.isNull(), F.lit(False)
    ).otherwise(F.exists(tokens, lambda t: url.contains(t)))


def verify_urls(
    candidates: DataFrame,
    url_col: str = "url",
    dynamic_filters: DataFrame | None = None,
    site_specs: DataFrame | None = None,
) -> DataFrame:
    """Apply the verification stage to a candidate-URL table: adds
    ``verify_status`` ∈ {article, not_article, wire} (+ drops F10 skips).

    ``site_specs``: (host, tokens array<string>) — broadcast dimension.
    """
    exc_re, inc_re = (
        collapse_dynamic_filters(dynamic_filters)
        if dynamic_filters is not None
        else (None, None)
    )
    out = candidates
    if site_specs is not None:
        spec = site_specs.select(
            F.col("host").alias("_spec_host"), F.col("tokens").alias("_spec_tokens")
        )
        host = _host_expr(F.col(url_col))
        out = (
            out.join(
                F.broadcast(spec),
                F.regexp_replace(host, r"^www\.", "") == spec["_spec_host"],
                "left",
            )
            .where(~site_spec_skip_expr(F.col(url_col), F.col("_spec_tokens")))
            .drop("_spec_host", "_spec_tokens")
        )
    return out.withColumn(
        "verify_status", verify_status_expr(F.col(url_col), exc_re, inc_re)
    )


def url_template_expr(url: Column) -> Column:
    """The trap-mining path template of a URL: lowercase path, long hex
    runs → 'H', digit runs → 'N', any query string → a bare '?Q' marker.
    Shared by :func:`mine_url_traps` (the counter) and the crawl's
    trap-guard anti-join (the enforcement) so both sides collapse a URL
    identically."""
    path = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://[^/]+(/[^?#]*)", 1))
    tmpl = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{16,}", "H"), r"[0-9]+", "N"
    )
    q = F.when(url.contains("?"), F.lit("?Q")).otherwise(F.lit(""))
    return F.concat(tmpl, q)


def mine_url_traps(
    urls: DataFrame,
    url_col: str = "url",
    max_per_template: int = 20,
) -> DataFrame:
    """Crawler-trap miner — the PRODUCER for the F4 dynamic
    url_path_filters table (the reference ships the table and its
    application, `src/models/__init__.py` url_path_filters +
    url_verification.py:253-329, but populates it by hand; at 10^10-URL
    scale the trap patterns have to be mined from the frontier itself).

    Every URL's path collapses to a template: lowercase, long hex runs →
    'H' (session ids, cache-buster hashes), digit runs → 'N' (calendar
    years/days, pagination), query string → a bare '?Q' marker.  A
    (host, template) pair carrying more than ``max_per_template``
    DISTINCT URLs is a trap suspect — calendar pages, faceted search,
    session-id explosions — exactly the URL families that balloon a
    frontier without yielding articles.  Returns one row per (host,
    template): ``n_urls``, ``trap`` flag, ``example_url`` (min — the
    row a human audits), ready to feed ``apply_dynamic_filters`` /
    ``build_wave`` as an exclusion dim.

    Plan: pure column expressions riding the scan + one groupBy on the
    uniform (host, template) key with map-side distinct-count partials.
    """
    return (
        urls.select(
            _host_expr(F.col(url_col)).alias("host"),
            url_template_expr(F.col(url_col)).alias("template"),
            F.col(url_col).alias("_u"),
        )
        .groupBy("host", "template")
        .agg(
            F.countDistinct("_u").alias("n_urls"),
            F.min("_u").alias("example_url"),
        )
        .withColumn("trap", F.col("n_urls") > F.lit(max_per_template))
    )
