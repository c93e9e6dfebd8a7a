"""S6 — proxy-scraping discovery: per-host regex link extraction for
bot-blocked sources.

The reference routes homepage fetches of sources flagged ``discovery_proxy``
through a residential proxy, then extracts article URLs from the raw HTML
with a per-domain regex instead of anchor parsing — bot-walled sites serve
pages whose article links exist only as raw paths (JS payloads, data
attributes), so the normal anchor extractor finds nothing
(/root/reference/src/crawler/discovery.py:2328-2410, pattern table at
:2389-2393; flow gated by ``source_row.discovery_proxy`` in
source_processing.py:629-650, with early-return on success).

Spark-first re-expression: the proxy itself is a ROUTING decision in the
reference (same ``session.get``, different ``proxies`` dict) — in this
sandbox the page store already holds the bytes the proxy would have seen,
so the operator models exactly the part that exists server-side: the
per-host pattern table and the regex extraction over raw HTML.

Scale notes (10^10 design point):
- The pattern table is a dimension (the reference ships ONE hardcoded
  pattern).  It is collected driver-side — the reference's TTL-cache
  analog, same shape as F4's dynamic filter table — and folded into a
  chained ``F.when(host == h, regexp_extract_all(html, lit(pattern)))``
  column expression: pure JVM, codegen'd, zero shuffle, zero Python.
- HTML never moves for unflagged hosts: callers pass the wave's results
  with ``html_kept`` populated only for flagged-host rows (see
  ``fetch_and_extract(keep_html_hosts=…)``), so this stage's input column
  is NULL almost everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (host, article_pattern, active) — mirrors the reference's
# ``patterns = {"bolivarmonews.com": r'/stories/[^"<>]+,\d+'}`` dict with
# the F4-style active flag for row-level enable/disable.
PROXY_PATTERN_SCHEMA = "host string, article_pattern string, active boolean"


def load_proxy_patterns(
    spark: SparkSession, rows: list[tuple[str, str]]
) -> DataFrame:
    """Build the proxy-pattern dimension from (host, regex) pairs."""
    return spark.createDataFrame(
        [(h, p, True) for h, p in rows], PROXY_PATTERN_SCHEMA
    )


def collect_patterns(patterns: DataFrame) -> list[tuple[str, str]]:
    """Driver-side (host, regex) list of active rows — dimension-sized."""
    return [
        (r["host"], r["article_pattern"])
        for r in patterns.where(F.col("active"))
        .select("host", "article_pattern")
        .collect()
    ]


def proxy_links_expr(
    pattern_rows: list[tuple[str, str]], host: Column, html: Column
) -> Column:
    """``array<string>`` of per-host pattern matches over raw HTML.

    Each branch carries its own literal regex so every
    ``regexp_extract_all`` stays foldable (JVM-compiled once); hosts
    without a pattern yield an empty array.
    """
    expr = F.array().cast("array<string>")
    html_s = F.coalesce(html.cast("string"), F.lit(""))
    for h, pat in reversed(pattern_rows):
        expr = F.when(host == h, F.regexp_extract_all(html_s, F.lit(pat), 0)).otherwise(
            expr
        )
    return expr


def proxy_pattern_discover(
    fetched: DataFrame,
    patterns: DataFrame,
    host_col: str = "host",
    html_col: str = "html_kept",
    url_col: str = "url",
) -> DataFrame:
    """Per-host regex link discovery over flagged-host fetches.

    Returns one row per (host, absolute url) match — in-batch-unique, the
    shape of the generic anchor extractor's exploded output — with
    ``via = 'proxy_scrape'`` provenance (the reference appends
    ``"proxy_scraping"`` to ``discovery_methods_attempted``).  Relative
    paths are absolutized against the fetched page's scheme+host, exactly
    like the reference's ``urljoin(source_url, path)``.
    """
    rows = collect_patterns(patterns)
    hosts = [h for h, _ in rows]
    if not rows:
        return (
            fetched.select(
                F.col(host_col).alias("host"),
                F.lit(None).cast("string").alias("url"),
                F.lit("proxy_scrape").alias("via"),
            ).where(F.lit(False))
        )
    flagged = fetched.where(F.col(host_col).isin(hosts))
    matches = flagged.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("_base"),
        F.explode(
            proxy_links_expr(rows, F.col(host_col), F.col(html_col))
        ).alias("_path"),
    )
    absolute = F.when(
        F.col("_path").startswith("http"), F.col("_path")
    ).otherwise(
        F.concat(
            F.regexp_extract(F.col("_base"), r"^(https?://[^/]+)", 1),
            F.col("_path"),
        )
    )
    return (
        matches.select("host", absolute.alias("url"), F.lit("proxy_scrape").alias("via"))
        .where(F.col("url").startswith("http"))
        .distinct()
    )
