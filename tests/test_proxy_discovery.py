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


ARTICLE_URL = f"https://www.{WALLED}/stories/county-fair-opens,1001"
ARTICLE_HTML = (
    "<html><head><title>Fair</title></head><body>"
    '<a href="/2024/01/05/deep-story.html">deep</a>'
    "<p>County fair opens with record attendance this year.</p>"
    "</body></html>"
).encode()


def _mini_walled_dfs(spark):
    """Two-page web for one walled host: the pattern-matching homepage plus
    one ARTICLE page that carries a generic anchor outlink."""
    import datetime as dt

    ts = dt.datetime(2024, 1, 10)
    pages = spark.createDataFrame(
        [
            (f"https://www.{WALLED}/", ts, bytearray(WALLED_HTML), "", "en"),
            (ARTICLE_URL, ts, bytearray(ARTICLE_HTML), "", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    seeds = spark.createDataFrame(
        [
            (
                f"src-{WALLED}", WALLED, "Walled Gazette", "daily", 1,
                [f"https://www.{WALLED}/feed"], "Columbia", "Boone", "active",
            )
        ],
        "source_id string, host string, name string, frequency string, "
        "bot_sensitivity int, feed_urls array<string>, city string, "
        "county string, status string",
    )
    robots = spark.createDataFrame(
        [(WALLED, "*", [], 0.0)],
        "host string, user_agent string, disallow array<string>, "
        "crawl_delay double",
    )
    return pages, seeds, robots


def test_article_outlinks_survive_proxy_early_return(spark):
    """ADVICE r3 (medium): the early-return anti-join keys on the fetched
    PAGE identity — when a flagged host's source page pattern-matches in the
    same wave an article page of that host is fetched, the article's generic
    outlinks must survive (they are otherwise permanently lost because
    articles tombstone)."""
    pages, seeds, robots = _mini_walled_dfs(spark)
    out = tempfile.mkdtemp(prefix="proxy_page_identity_")
    # cadence daily (0.25 d) + 1-day waves → the homepage is cadence-due
    # again at wave 1, landing in the SAME wave as the stories fetched there
    cfg = CrawlConfig(
        max_waves=3, wave_duration=86400.0, max_per_host=10,
        bloom_capacity=10000, recrawl_sources=True,
        proxy_patterns=((WALLED, PATTERN),),
    )
    run_crawl(spark, pages, seeds, robots, out, cfg)
    t = open_tables(spark, out)
    seen = sorted(r["url_surt"] for r in t.url_seen.read().collect())
    assert any("county-fair-opens" in s for s in seen)  # proxy path worked
    assert any("deep-story" in s for s in seen)  # article outlink survived


def test_proxy_candidates_respect_child_depth(spark, walled_web):
    """ADVICE r3 (low): proxy-discovered candidates are gated on the CHILD
    depth like generic links — with max_depth=0 nothing leaves the seeds."""
    pages, seeds, robots = walled_web
    out = tempfile.mkdtemp(prefix="proxy_depth_")
    cfg = CrawlConfig(
        max_waves=1, bloom_capacity=10000, max_depth=0,
        proxy_patterns=((WALLED, PATTERN),),
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
    seen = [r["url_surt"] for r in t.url_seen.read().collect()]
    assert not any("/stories/" in s for s in seen)


def test_empty_pattern_table_is_empty_result(spark):
    pats = load_proxy_patterns(spark, [])
    fetched = spark.createDataFrame(
        [("https://a.test/", "a.test", bytearray(b"x"))],
        "url string, host string, html_kept binary",
    )
    assert proxy_pattern_discover(fetched, pats).count() == 0
