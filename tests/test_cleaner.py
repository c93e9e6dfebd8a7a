"""C14 boilerplate cleaner: per-host pattern mining, application, and the
cleaned-text paywall gate (VERDICT r1 missing #3).

The fixture web injects two per-host chrome paragraphs into every article
(newsletter pitch + copyright footer).  Mining must find exactly that
chrome per host, application must strip it from every article, and paywall
stubs — whose RAW text passes the 150-char gate only because of the chrome
— must be demoted to 'paywall' on cleaned text (the reference's
cleaning-dry-run behavior, extraction.py:1518-1595)."""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.crawl import CrawlConfig, open_tables, run_crawl
from mizzounewscrawler_spark.operators.cleaner import (
    apply_cleaning,
    mine_boilerplate,
)
from mizzounewscrawler_spark.sources.generator import _boiler_html


@pytest.fixture(scope="module")
def engine_articles(spark, web_spark):
    pages, seeds, robots = web_spark
    out_dir = tempfile.mkdtemp(prefix="cleaner_crawl_")
    run_crawl(
        spark, pages, seeds, robots, out_dir,
        CrawlConfig(max_waves=5, with_order_log=False),
    )
    arts = open_tables(spark, out_dir).articles.read().cache()
    arts.count()
    yield arts
    arts.unpersist()
    shutil.rmtree(out_dir, ignore_errors=True)


def _strip_tags(p: str) -> str:
    return re.sub(r"<[^>]+>", "", p)


def test_mining_finds_injected_chrome(spark, engine_articles):
    pats = mine_boilerplate(engine_articles).cache()
    hosts = [r["host"] for r in
             engine_articles.select("host").distinct().collect()]
    by_host = {
        h: {r["line"] for r in pats.where(F.col("host") == h).collect()}
        for h in hosts
    }
    found_hosts = 0
    for h, lines in by_host.items():
        if not lines:
            continue  # hosts with too few fetched articles can't hit support
        top, bottom = (_strip_tags(x) for x in _boiler_html(h))
        assert top in lines, (h, lines)
        assert bottom in lines, (h, lines)
        found_hosts += 1
    assert found_hosts >= 3, "mining found chrome on too few hosts"
    pats.unpersist()


def test_application_strips_chrome_and_keeps_content(spark, engine_articles):
    pats = mine_boilerplate(engine_articles)
    cleaned = apply_cleaning(engine_articles, pats)
    rows = cleaned.where(F.col("status") == "cleaned").collect()
    assert rows, "no cleaned articles"
    for r in rows[:50]:
        top, bottom = (_strip_tags(x) for x in _boiler_html(r["host"]))
        assert top not in r["text_clean"], r["url"]
        assert bottom not in r["text_clean"], r["url"]
        # real content survives
        assert len(r["text_clean"]) >= 150, r["url"]
        # cleaned text is a subsequence of raw lines (nothing invented)
        raw_lines = set(r["text"].split("\n"))
        for ln in r["text_clean"].split("\n"):
            if ln:
                assert ln in raw_lines


def test_paywall_demotion_on_cleaned_text(spark, engine_articles):
    """Paywall stubs pass the raw gate (chrome-inflated) but must fall
    under 150 chars once cleaned."""
    pats = mine_boilerplate(engine_articles)
    cleaned = apply_cleaning(engine_articles, pats)
    stubs = cleaned.where(F.col("url").rlike("story-(13|30|47|64)\\.html$"))
    got = {r["url"]: r["status"] for r in stubs.collect()}
    demoted = [u for u, s in got.items() if s == "paywall"]
    assert demoted, f"no paywall demotions among stubs: {got}"


def test_non_extracted_statuses_pass_through(spark, engine_articles):
    pats = mine_boilerplate(engine_articles)
    cleaned = apply_cleaning(engine_articles, pats)
    before = {r["url"]: r["status"] for r in engine_articles.collect()}
    after = {r["url"]: r["status"] for r in cleaned.collect()}
    for url, s in before.items():
        if s != "extracted":
            assert after[url] == s, url
        else:
            assert after[url] in ("cleaned", "paywall"), url
