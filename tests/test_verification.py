"""Verification stage (F3/F4/F5/F9/F10/U4): chain order, dynamic filter
table, site-spec skip, and the frontier status transition semantics."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mizzounewscrawler_spark.operators.verification import (  # noqa: E402
    sniffer_guess_expr,
    verify_status_expr,
    verify_urls,
)


def _classify(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.withColumn("s", verify_status_expr(F.col("url"))).collect()
    return {r["url"]: r["s"] for r in rows}


def test_chain_branches(spark):
    got = _classify(spark, [
        "https://bit.ly/abc",                                   # F5 shortener
        "https://www.youtube.com/watch?v=1",                    # F5 non-news
        "https://apnews.com/article/xyz",                       # F9 wire url
        "https://www.paper.test/search/q?x=1",                  # blocklist
        "https://www.paper.test/tag/politics/",                 # blocklist
        "https://www.paper.test/img/photo.jpg",                 # blocklist ext
        "https://www.paper.test/news/local-fire",               # allowlist
        "https://www.paper.test/2024/01/12/city-vote/",         # date path
        "https://www.paper.test/story/abc",                     # story path
        "https://www.paper.test/city-council-meeting-48213",    # numeric id
    ])
    assert got["https://bit.ly/abc"] == "not_article"
    assert got["https://www.youtube.com/watch?v=1"] == "not_article"
    assert got["https://apnews.com/article/xyz"] == "wire"
    assert got["https://www.paper.test/search/q?x=1"] == "not_article"
    assert got["https://www.paper.test/tag/politics/"] == "not_article"
    assert got["https://www.paper.test/img/photo.jpg"] == "not_article"
    assert got["https://www.paper.test/news/local-fire"] == "article"
    assert got["https://www.paper.test/2024/01/12/city-vote/"] == "article"
    assert got["https://www.paper.test/story/abc"] == "article"
    assert got["https://www.paper.test/city-council-meeting-48213"] == "article"


def test_stage_order_blocklist_beats_allowlist(spark):
    # /search/ (blocklist) inside a dated path: blocklist fires first — the
    # reference normalizes then blocklists BEFORE allowlist (url_filters.py)
    got = _classify(spark, ["https://www.paper.test/search/2024/01/12/x"])
    assert list(got.values()) == ["not_article"]


def test_sniffer_fallback_is_deterministic(spark):
    urls = [f"https://www.paper.test/p{i}" for i in range(40)]
    a = _classify(spark, urls)
    b = _classify(spark, urls)
    assert a == b
    # the stub must actually split the population (both outcomes occur)
    assert set(a.values()) == {"article", "not_article"}


def test_sniffer_only_on_survivors(spark):
    """Allowlisted URLs never consult the sniffer (chain order contract)."""
    df = spark.createDataFrame(
        [("https://www.paper.test/news/x",)], "url string"
    )
    r = df.select(
        verify_status_expr(F.col("url")).alias("s"),
        sniffer_guess_expr(F.col("url")).alias("sniff"),
    ).collect()[0]
    assert r["s"] == "article"  # even if sniff says False


def test_dynamic_filter_table(spark):
    pats = spark.createDataFrame(
        [
            (r"/sponsored/", "exclude", "ads", True),
            (r"/liveblog/", "include", "manual allow", True),
            (r"/everything/", "exclude", "inactive row", False),
        ],
        "pattern string, filter_type string, reason string, active boolean",
    )
    df = spark.createDataFrame(
        [
            ("https://www.paper.test/sponsored/buy-now-123",),   # excl beats allowlist
            ("https://www.paper.test/liveblog/x",),              # incl beats blocklist fallthrough
            ("https://www.paper.test/everything/else-999",),     # inactive -> allowlist wins
        ],
        "url string",
    )
    out = {r["url"]: r["verify_status"]
           for r in verify_urls(df, dynamic_filters=pats).collect()}
    assert out["https://www.paper.test/sponsored/buy-now-123"] == "not_article"
    assert out["https://www.paper.test/liveblog/x"] == "article"
    assert out["https://www.paper.test/everything/else-999"] == "article"


def test_site_spec_skip(spark):
    specs = spark.createDataFrame(
        [("paper.test", ["/coupons", "print-edition"])],
        "host string, tokens array<string>",
    )
    df = spark.createDataFrame(
        [
            ("https://www.paper.test/coupons/week12",),
            ("https://www.paper.test/news/real-story",),
            ("https://www.other.test/coupons/week12",),  # no spec for host
        ],
        "url string",
    )
    out = verify_urls(df, site_specs=specs)
    urls = {r["url"] for r in out.collect()}
    assert "https://www.paper.test/coupons/week12" not in urls
    assert "https://www.paper.test/news/real-story" in urls
    assert "https://www.other.test/coupons/week12" in urls


def test_mine_url_traps_flags_calendar_and_session_patterns(spark):
    from mizzounewscrawler_spark.operators.verification import mine_url_traps

    rows = (
        [(f"https://trap.test/calendar/2024/{i}?day={i}",) for i in range(30)]
        + [(f"https://trap.test/sess/{'ab12cd34' * 3}{i:08d}/page",)
           for i in range(25)]
        + [(f"https://ok.test/stories/story-{chr(97 + i)}",) for i in range(30)]
        + [("https://ok.test/about",)]
    )
    df = spark.createDataFrame(rows, "url string")
    out = {(r["host"], r["template"]): r
           for r in mine_url_traps(df, max_per_template=20).collect()}
    cal = out[("trap.test", "/calendar/N/N?Q")]
    assert cal["trap"] and cal["n_urls"] == 30
    # 24-char hex+digit run collapses to H (then trailing digits to N)
    sess = [k for k in out if k[0] == "trap.test" and "/sess/" in k[1]]
    assert len(sess) == 1 and out[sess[0]]["trap"]
    # one-off story slugs never aggregate into a trap
    assert all(
        not v["trap"] for (h, t), v in out.items() if h == "ok.test"
    )
    assert cal["example_url"].startswith("https://trap.test/calendar/")


def test_mine_url_traps_catalog_oracle_parity(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_URL_TRAPS,
        q_url_trap_mining,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in q_url_trap_mining(spark, sf).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(SQL_URL_TRAPS).fetchall())
    assert got == want
    traps = [r for r in got if r[4]]
    assert len(traps) == 1 and traps[0][0] == "www.src0.test"
