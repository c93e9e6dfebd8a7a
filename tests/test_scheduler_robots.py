"""Wave scheduler budgets/ordering/backoff and robots.txt enforcement."""

from __future__ import annotations

import pyspark.sql.functions as F

from mizzounewscrawler_spark.functions.urls import surt, url_hash
from mizzounewscrawler_spark.operators.robots import apply_robots, robots_allowed_py
from mizzounewscrawler_spark.operators.scheduler import (
    build_wave,
    update_host_state,
)


def _frontier(spark, rows):
    # rows: (url, priority, depth)
    data = []
    for url, prio, depth in rows:
        s = surt(url)
        host = ".".join(reversed(s.split(")", 1)[0].split(",")))
        data.append((url, s, url_hash(s), host, "discovered", prio, depth))
    return spark.createDataFrame(
        data, "url string, url_surt string, url_hash long, host string, "
        "status string, priority int, depth int"
    )


def _seeds(spark, hosts_sens):
    return spark.createDataFrame(
        [(h, sv, [f"https://www.{h}/feed"]) for h, sv in hosts_sens],
        "host string, bot_sensitivity int, feed_urls array<string>",
    )


def _robots(spark, rows):
    return spark.createDataFrame(
        rows, "host string, user_agent string, disallow array<string>, crawl_delay double"
    )


def test_budget_caps_per_host(spark):
    urls = [(f"https://fast.test/a{i}", 1, 0) for i in range(10)]
    urls += [(f"https://slow.test/b{i}", 1, 0) for i in range(10)]
    fr = _frontier(spark, urls)
    seeds = _seeds(spark, [("fast.test", 1), ("slow.test", 1)])
    robots = _robots(
        spark,
        [("fast.test", "*", [], 1.0), ("slow.test", "*", [], 45.0)],
    )
    wave = build_wave(fr, seeds, robots, None, wave_ts=0.0, wave_duration=60.0)
    counts = {r["host"]: r["n"] for r in wave.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts["fast.test"] == 3  # capped at MAX_PER_HOST (60/1 > 3)
    assert counts["slow.test"] == 1  # floor(60/45)=1


def test_wave_order_deterministic_priority_then_hash(spark):
    urls = [(f"https://h.test/p{i}", 1, 0) for i in range(3)]
    urls.append(("https://h.test/feed", 2, 0))
    fr = _frontier(spark, urls)
    seeds = _seeds(spark, [("h.test", 1)])
    robots = _robots(spark, [("h.test", "*", [], 0.5)])
    wave = build_wave(fr, seeds, robots, None, 0.0).orderBy("seq").collect()
    assert wave[0]["url_surt"].endswith(")/feed")  # priority 2 first
    hashes = [r["url_hash"] for r in wave[1:]]
    assert hashes == sorted(hashes)


def test_backoff_excludes_host(spark):
    fr = _frontier(spark, [("https://h.test/x", 1, 0), ("https://ok.test/y", 1, 0)])
    seeds = _seeds(spark, [("h.test", 1), ("ok.test", 1)])
    robots = _robots(spark, [("h.test", "*", [], 1.0), ("ok.test", "*", [], 1.0)])
    hs = spark.createDataFrame(
        [("h.test", 3, 1800.0, 0, 0)],
        "host string, consecutive_failures int, backoff_until double, "
        "last_wave int, fetched_total long",
    )
    wave = build_wave(fr, seeds, robots, hs, wave_ts=60.0)
    assert {r["host"] for r in wave.collect()} == {"ok.test"}
    wave_later = build_wave(fr, seeds, robots, hs, wave_ts=1800.0)
    assert {r["host"] for r in wave_later.collect()} == {"ok.test", "h.test"}


def test_host_state_backoff_progression(spark):
    results = spark.createDataFrame(
        [("bad.test", False), ("bad.test", False), ("good.test", True)],
        "host string, ok boolean",
    )
    hs1 = update_host_state(None, results, wave_ts=0.0, wave_idx=0)
    rows = {r["host"]: r for r in hs1.collect()}
    assert rows["bad.test"]["consecutive_failures"] == 2
    assert rows["bad.test"]["backoff_until"] == 0.0 + 60.0 * 2  # 60*2^(2-1)
    assert rows["good.test"]["consecutive_failures"] == 0
    assert rows["good.test"]["backoff_until"] is None
    # third failure → 30 min pause
    r2 = spark.createDataFrame([("bad.test", False)], "host string, ok boolean")
    hs2 = update_host_state(hs1, r2, wave_ts=300.0, wave_idx=1)
    bad = [r for r in hs2.collect() if r["host"] == "bad.test"][0]
    assert bad["consecutive_failures"] == 3
    assert bad["backoff_until"] == 300.0 + 1800.0
    # success resets
    r3 = spark.createDataFrame([("bad.test", True)], "host string, ok boolean")
    hs3 = update_host_state(hs2, r3, wave_ts=2400.0, wave_idx=2)
    bad = [r for r in hs3.collect() if r["host"] == "bad.test"][0]
    assert bad["consecutive_failures"] == 0 and bad["backoff_until"] is None


def test_robots_prefix_enforcement(spark):
    cand = _frontier(
        spark,
        [
            ("https://r.test/private/x.html", 1, 1),
            ("https://r.test/news/ok.html", 1, 1),
            ("https://free.test/private/y.html", 1, 1),
        ],
    )
    robots = _robots(spark, [("r.test", "*", ["/private/", "/tag/"], 1.0)])
    out = apply_robots(cand, robots)
    got = {r["url"]: r["robots_allowed"] for r in out.collect()}
    assert got["https://r.test/private/x.html"] is False
    assert got["https://r.test/news/ok.html"] is True
    assert got["https://free.test/private/y.html"] is True  # no rules ⇒ allowed
    # python twin agrees
    assert robots_allowed_py("/private/x.html", ["/private/"]) is False
    assert robots_allowed_py("/news/ok.html", ["/private/"]) is True
    assert robots_allowed_py("/anything", None) is True


def test_parse_robots_txt_groups_and_pipeline(spark):
    """Raw robots.txt bodies → rules table → apply_robots end to end:
    shared-group user agents, repeated groups unioned, comments/blank
    lines, empty Disallow ignored, crawl-delay parsed, and the parsed
    '*' group actually blocking a candidate."""
    from mizzounewscrawler_spark.operators.robots import (
        apply_robots,
        parse_robots_txt,
    )

    body_a = """
# global rules
User-agent: *
Disallow: /private/
Disallow:          # empty value -> allow-all, ignored
Crawl-delay: 2.5

User-agent: fastbot
User-agent: otherbot
Allow: /public/
Disallow: /tmp/

User-agent: *        # second * group: rules UNION per RFC 9309
Disallow: /drafts/
"""
    bodies = spark.createDataFrame(
        [("a.test", body_a), ("b.test", "User-agent: *\nDisallow:\n")],
        ["host", "body"],
    )
    rules = {
        (r["host"], r["user_agent"]): r
        for r in parse_robots_txt(bodies).collect()
    }
    star = rules[("a.test", "*")]
    assert sorted(star["disallow"]) == ["/drafts/", "/private/"]
    assert star["crawl_delay"] == 2.5
    for agent in ("fastbot", "otherbot"):  # shared group
        g = rules[("a.test", agent)]
        assert list(g["disallow"]) == ["/tmp/"] and list(g["allow"]) == ["/public/"]
    assert list(rules[("b.test", "*")]["disallow"]) == []

    cands = spark.createDataFrame(
        [
            ("a.test", "test,a)/private/x"),
            ("a.test", "test,a)/drafts/y"),
            ("a.test", "test,a)/news/z"),
            ("b.test", "test,b)/anything"),
        ],
        ["host", "url_surt"],
    )
    got = {
        r["url_surt"]: r["robots_allowed"]
        for r in apply_robots(cands, parse_robots_txt(bodies)).collect()
    }
    assert got == {
        "test,a)/private/x": False,
        "test,a)/drafts/y": False,
        "test,a)/news/z": True,
        "test,b)/anything": True,
    }


def test_quality_yield_priority_ordering_and_exploration(spark):
    """Within a priority band, higher-yield hosts rank first; hosts with
    no history get the neutral boost; base priority still dominates."""
    from pyspark.sql import functions as F

    from mizzounewscrawler_spark.operators.scheduler import (
        quality_yield_priority,
    )

    arts = spark.createDataFrame(
        [("good.test", 500)] * 9 + [("good.test", 10)]
        + [("bad.test", 10)] * 9 + [("bad.test", 500)],
        "host string, n_chars int",
    )
    frontier = spark.createDataFrame(
        [
            (1, "good.test", 1),
            (2, "bad.test", 1),
            (3, "new.test", 1),
            (4, "bad.test", 2),   # higher band beats any yield below
        ],
        "url_hash long, host string, priority int",
    )
    out = {r["url_hash"]: r for r in quality_yield_priority(
        frontier, arts, F.col("n_chars") >= 300
    ).collect()}
    assert out[1]["yield_bp"] == 9000
    assert out[2]["yield_bp"] == 1000
    assert out[3]["yield_bp"] == 5000 and out[3]["fetched"] == 0
    ranked = sorted(out, key=lambda k: (-out[k]["priority2"], k))
    assert ranked == [4, 1, 3, 2]


def test_quality_yield_catalog_oracle_parity(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_QUALITY_YIELD,
        q_quality_yield_priority,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in q_quality_yield_priority(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(SQL_QUALITY_YIELD).fetchall())
    assert got == want


def test_salted_wave_parity_and_adaptive_nsalts(spark):
    """The two-stage salted per-host window must pick the IDENTICAL wave
    as the plain window (any true top-budget row is top-budget within its
    own salt), and adaptive_nsalts derives fan-out from the actual
    histogram: 1 for uniform data, 2^k for a hot host."""
    import pandas as pd

    from mizzounewscrawler_spark.operators.scheduler import (
        adaptive_nsalts,
        build_wave,
    )

    rows = []
    # hot host: 500 pending rows; cold hosts: 5 each
    for i in range(500):
        rows.append(("hot.test", i))
    for h in range(20):
        for i in range(5):
            rows.append((f"cold-{h}.test", 1000 + h * 10 + i))
    pdf = pd.DataFrame(rows, columns=["host", "k"])
    frontier = spark.createDataFrame(pdf).selectExpr(
        "concat('https://', host, '/p', k) as url",
        "concat(host, ')/p', k) as url_surt",
        "xxhash64(concat(host, k)) as url_hash",
        "host",
        "'discovered' as status",
        "cast(k % 7 as double) as priority",
        "0 as depth",
    )
    seeds = spark.createDataFrame(
        pdf[["host"]].drop_duplicates().assign(bot_sensitivity=1)
    )
    robots = spark.createDataFrame(
        pdf[["host"]].drop_duplicates().assign(
            user_agent="*", crawl_delay=0.0
        )
    )

    key = lambda r: (r["host"], r["url_hash"])  # noqa: E731
    base = sorted(
        map(
            key,
            build_wave(
                frontier, seeds, robots, None, 0.0, max_per_host=3,
                with_global_order=False,
            ).collect(),
        )
    )
    for nsalts in (2, 8):
        salted = sorted(
            map(
                key,
                build_wave(
                    frontier, seeds, robots, None, 0.0, max_per_host=3,
                    with_global_order=False, salt_partitions=nsalts,
                ).collect(),
            )
        )
        assert salted == base, nsalts

    # histogram-derived fan-out
    assert adaptive_nsalts(frontier, rows_per_task=1000) == 1
    assert adaptive_nsalts(frontier, rows_per_task=100) == 8  # 500/100→2^3
    assert adaptive_nsalts(frontier, rows_per_task=250) == 2
    assert adaptive_nsalts(frontier, rows_per_task=1, max_salts=16) == 16


def test_crawl_with_adaptive_salting_forced_matches_default(spark, web_spark):
    """Force the wave loop's adaptive-salting trigger (salt_trigger_rows=1,
    rows-per-task target=1 → every host over 1 pending row salts): the
    crawl's url_seen set and articles must be identical to the unsalted
    default — the salted window is result-preserving end-to-end."""
    import tempfile

    from mizzounewscrawler_spark.crawl import (
        CrawlConfig,
        open_tables,
        run_crawl,
    )

    pages, seeds, robots = web_spark
    results = {}
    for name, cfg in {
        "default": CrawlConfig(max_waves=3),
        "salted": CrawlConfig(
            max_waves=3, salt_trigger_rows=1, salt_rows_per_task=1
        ),
    }.items():
        out = tempfile.mkdtemp(prefix=f"crawl_salt_{name}_")
        run_crawl(spark, pages, seeds, robots, out, cfg)
        t = open_tables(spark, out)
        results[name] = (
            sorted(r["url_surt"] for r in t.url_seen.read().collect()),
            sorted(
                (r["url"], r["status"])
                for r in t.articles.read().collect()
            ),
        )
    assert results["salted"] == results["default"]
    assert len(results["default"][0]) > 10
