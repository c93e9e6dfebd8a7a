"""S6 proxy-scraping discovery: per-host regex extraction over raw HTML
for bot-walled sources (reference discovery.py:2328-2410,
source_processing.py:629-650)."""

from __future__ import annotations

import tempfile

import pytest

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
from mizzounewscrawler_spark.operators.proxy_discovery import (
    load_proxy_patterns,
    proxy_pattern_discover,
)

WALLED = "site0000.news.test"
PATTERN = r"/stories/[^\"<>]+,\d+"

# a bot-walled homepage: article URLs exist only as raw paths inside a JS
# payload — no <a> anchors for the generic extractor to find
WALLED_HTML = (
    "<html><head><title>walled</title></head><body>"
    '<script>window.__DATA__={"articles":['
    '{"url":"/stories/county-fair-opens,1001"},'
    '{"url":"/stories/school-board-vote,1002"},'
    '{"url":"/stories/county-fair-opens,1001"},'
    '{"url":"https://www.site0000.news.test/stories/flood-warning,1003"}'
    "]}</script></body></html>"
).encode()


@pytest.fixture(scope="module")
def walled_web(web):
    """Fixture web with host 0's homepage swapped to the bot-walled page."""
    pages = web.pages.copy()
    hp = f"https://www.{WALLED}/"
    pages.loc[pages.url == hp, "html"] = [WALLED_HTML]
    return pages, web.seeds, web.robots


def _crawl(spark, walled_web, proxy_patterns):
    pages, seeds, robots = walled_web
    out = tempfile.mkdtemp(prefix="proxy_crawl_")
    cfg = CrawlConfig(
        max_waves=2, bloom_capacity=10000, proxy_patterns=proxy_patterns
    )
    run_crawl(
        spark,
        spark.createDataFrame(pages),
        spark.createDataFrame(seeds),
        spark.createDataFrame(robots),
        out,
        cfg,
    )
    t = open_tables(spark, out)
    return sorted(r["url_surt"] for r in t.url_seen.read().collect())


def test_pattern_links_discovered_and_generic_replaced(spark, walled_web):
    seen = _crawl(spark, walled_web, ((WALLED, PATTERN),))
    stories = [s for s in seen if "/stories/" in s]
    # the three distinct pattern paths were discovered and canonicalized
    assert len(stories) == 3
    assert any("county-fair-opens,1001" in s for s in stories)
    assert any("flood-warning,1003" in s for s in stories)  # absolute form
    # early-return semantics: the walled homepage's generic links (none
    # parseable here) contribute nothing, but OTHER hosts' generic
    # discovery is untouched
    assert any(("site0001" in s) and ("/20" in s or "news" in s) for s in seen)


def test_without_patterns_walled_host_discovers_nothing(spark, walled_web):
    seen = _crawl(spark, walled_web, None)
    assert not any("/stories/" in s for s in seen)


def test_operator_standalone_shapes(spark):
    pats = load_proxy_patterns(spark, [(WALLED, PATTERN)])
    fetched = spark.createDataFrame(
        [
            (f"https://www.{WALLED}/", WALLED, bytearray(WALLED_HTML)),
            ("https://other.test/", "other.test", bytearray(b"<a href='/x,1'>")),
        ],
        "url string, host string, html_kept binary",
    )
    out = proxy_pattern_discover(fetched, pats).collect()
    urls = sorted(r["url"] for r in out)
    # unflagged host contributes nothing; matches are distinct + absolute
    assert urls == [
        f"https://www.{WALLED}/stories/county-fair-opens,1001",
        f"https://www.{WALLED}/stories/flood-warning,1003",
        f"https://www.{WALLED}/stories/school-board-vote,1002",
    ]
    assert all(r["via"] == "proxy_scrape" for r in out)


def test_empty_pattern_table_is_empty_result(spark):
    pats = load_proxy_patterns(spark, [])
    fetched = spark.createDataFrame(
        [("https://a.test/", "a.test", bytearray(b"x"))],
        "url string, host string, html_kept binary",
    )
    assert proxy_pattern_discover(fetched, pats).count() == 0
