"""P8 sensitivity adaptation, P10 adaptive source pause, P11 RSS retry
windows (VERDICT r1 missing #7), plus C15 ROT47, C4 registered-domain, and
S11 checksum exports."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mizzounewscrawler_spark.functions.text import rot47, rot47_expr  # noqa: E402
from mizzounewscrawler_spark.functions.urls import (  # noqa: E402
    registered_domain,
    registered_domain_expr,
)
from mizzounewscrawler_spark.lake import LakeTable  # noqa: E402
from mizzounewscrawler_spark.operators.scheduler import (  # noqa: E402
    SENSITIVITY_DECAY_WAVES,
    build_wave,
    update_host_state,
)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "host string, bot_sensitivity int, cadence_days double"
    )


def _hs(spark, host_state, results_rows, wave_ts, wave_idx, dim):
    r = spark.createDataFrame(
        results_rows, "host string, ok boolean, challenge boolean, is_feed boolean"
    )
    return update_host_state(host_state, r, wave_ts, wave_idx, host_dim=dim)


def test_sensitivity_captcha_and_failure_bumps(spark):
    dim = _dim(spark, [("h.test", 2, 0.25)])
    hs1 = _hs(spark, None, [("h.test", False, True, False)], 0.0, 0, dim)
    row = hs1.collect()[0]
    assert row["bot_sensitivity"] == 5  # 2 + captcha 3
    assert row["sens_event_wave"] == 0
    hs2 = _hs(spark, hs1, [("h.test", False, False, False)], 60.0, 1, dim)
    row = hs2.collect()[0]
    assert row["bot_sensitivity"] == 6  # +1 plain failure
    # cap at 10
    state = hs2
    for w in range(2, 9):
        state = _hs(spark, state, [("h.test", False, True, False)], w * 60.0, w, dim)
    assert state.collect()[0]["bot_sensitivity"] == 10


def test_sensitivity_decays_toward_base_when_quiet(spark):
    dim = _dim(spark, [("h.test", 2, 0.25)])
    state = _hs(spark, None, [("h.test", False, True, False)], 0.0, 0, dim)
    # quiet success waves; decay after SENSITIVITY_DECAY_WAVES
    for w in range(1, SENSITIVITY_DECAY_WAVES):
        state = _hs(spark, state, [("h.test", True, False, False)], w * 60.0, w, dim)
        assert state.collect()[0]["bot_sensitivity"] == 5, w  # no decay yet
    w = SENSITIVITY_DECAY_WAVES
    state = _hs(spark, state, [("h.test", True, False, False)], w * 60.0, w, dim)
    assert state.collect()[0]["bot_sensitivity"] == 4  # one-tier decay


def test_adaptive_pause_threshold_by_cadence(spark):
    # monthly cadence (30 d) → threshold 3 → day-long pause with reason
    dim = _dim(spark, [("slow.test", 5, 30.0)])
    state = None
    for w in range(3):
        state = _hs(
            spark, state, [("slow.test", False, False, False)], w * 60.0, w, dim
        )
    row = state.collect()[0]
    assert row["consecutive_failures"] == 3
    assert row["paused_reason"] == "persistent_failures"
    assert row["backoff_until"] == 2 * 60.0 + 86400.0
    # daily cadence (0.25 d) → threshold 7 → still the 30-min pause at 3
    dim2 = _dim(spark, [("fast.test", 5, 0.25)])
    state2 = None
    for w in range(3):
        state2 = _hs(
            spark, state2, [("fast.test", False, False, False)], w * 60.0, w, dim2
        )
    row2 = state2.collect()[0]
    assert row2["paused_reason"] is None
    assert row2["backoff_until"] == 2 * 60.0 + 1800.0


def test_feed_retry_window_blocks_feed_urls_only(spark):
    from mizzounewscrawler_spark.functions.urls import surt, url_hash

    dim = _dim(spark, [("h.test", 1, 3.5)])
    # failed feed fetch opens clamp(2*3.5, 2..7)=7d window
    state = _hs(spark, None, [("h.test", False, False, True)], 0.0, 0, dim)
    row = state.collect()[0]
    assert row["feed_retry_until"] == 7 * 86400.0
    # build a frontier with the feed + an article URL
    rows = []
    for url, prio in [("https://www.h.test/feed", 2), ("https://www.h.test/a1", 1)]:
        s = surt(url)
        rows.append((url, s, url_hash(s), "h.test", "discovered", prio, 0))
    fr = spark.createDataFrame(
        rows, "url string, url_surt string, url_hash long, host string, "
        "status string, priority int, depth int"
    )
    seeds = spark.createDataFrame(
        [("h.test", 1, ["https://www.h.test/feed"])],
        "host string, bot_sensitivity int, feed_urls array<string>",
    )
    robots = spark.createDataFrame(
        [("h.test", "*", [], 0.5)],
        "host string, user_agent string, disallow array<string>, crawl_delay double",
    )
    wave = build_wave(fr, seeds, robots, state, wave_ts=60.0)
    got = {r["url"] for r in wave.collect()}
    assert got == {"https://www.h.test/a1"}  # feed sits out, host crawls on
    # a feed success clears the window
    state2 = _hs(spark, state, [("h.test", True, False, True)], 60.0, 1, dim)
    assert state2.collect()[0]["feed_retry_until"] is None


def test_no_event_wave_preserves_backoff_and_pause(spark):
    """ADVICE r2 (high): a host with ZERO events this wave (it sat the wave
    out in backoff — full-outer row with _succ=0/_fail=0) must keep its
    backoff_until / paused_reason untouched, not have the pause re-fired
    from the current wave_ts every wave (permanent starvation)."""
    dim = _dim(spark, [("slow.test", 5, 30.0), ("other.test", 5, 0.25)])
    state = None
    for w in range(3):
        state = _hs(
            spark, state, [("slow.test", False, False, False)], w * 60.0, w, dim
        )
    row = {r["host"]: r for r in state.collect()}["slow.test"]
    assert row["paused_reason"] == "persistent_failures"
    paused_until = row["backoff_until"]
    assert paused_until == 2 * 60.0 + 86400.0
    # waves 3..5: slow.test has no events (only other.test does)
    for w in range(3, 6):
        state = _hs(
            spark, state, [("other.test", True, False, False)], w * 60.0, w, dim
        )
        row = {r["host"]: r for r in state.collect()}["slow.test"]
        assert row["backoff_until"] == paused_until, w  # NOT re-fired
        assert row["paused_reason"] == "persistent_failures", w
        assert row["consecutive_failures"] == 3, w


def test_source_next_due_rearm_and_recrawl_gate(spark):
    """P1: a wave touching a host's source URLs re-arms source_next_due =
    wave_ts + cadence_days*86400; build_wave(recrawl_sources=True) gates the
    host's source URLs until due (articles keep crawling); drain mode
    (default) ignores the clock."""
    from mizzounewscrawler_spark.functions.urls import surt, url_hash
    from mizzounewscrawler_spark.operators.scheduler import HOST_STATE_SCHEMA

    dim = _dim(spark, [("h.test", 1, 0.25)])  # daily: due after 21600 s
    results = spark.createDataFrame(
        [("h.test", True, False, True, True)],
        "host string, ok boolean, challenge boolean, is_feed boolean, "
        "is_source boolean",
    )
    state = update_host_state(None, results, 0.0, 0, host_dim=dim)
    row = state.collect()[0]
    assert row["source_next_due"] == 0.25 * 86400.0
    # a later wave with no events for the host preserves the clock
    other = spark.createDataFrame(
        [("x.test", True, False, False, False)],
        "host string, ok boolean, challenge boolean, is_feed boolean, "
        "is_source boolean",
    )
    state2 = update_host_state(state, other, 60.0, 1, host_dim=dim)
    rows2 = {r["host"]: r for r in state2.collect()}
    assert rows2["h.test"]["source_next_due"] == 0.25 * 86400.0

    rows = []
    for url, prio in [
        ("https://www.h.test/feed", 2),
        ("https://www.h.test/", 1),
        ("https://www.h.test/a1", 1),
    ]:
        s = surt(url)
        rows.append((url, s, url_hash(s), "h.test", "discovered", prio, 0))
    fr = spark.createDataFrame(
        rows, "url string, url_surt string, url_hash long, host string, "
        "status string, priority int, depth int"
    )
    seeds = spark.createDataFrame(
        [("h.test", 1, ["https://www.h.test/feed"])],
        "host string, bot_sensitivity int, feed_urls array<string>",
    )
    robots = spark.createDataFrame(
        [("h.test", "*", [], 0.5)],
        "host string, user_agent string, disallow array<string>, crawl_delay double",
    )
    # not yet due (wave_ts 60 < 21600): sources sit out, article crawls
    wave = build_wave(fr, seeds, robots, state, wave_ts=60.0, recrawl_sources=True)
    assert {r["url"] for r in wave.collect()} == {"https://www.h.test/a1"}
    # due (wave_ts = 21600): sources are back
    wave2 = build_wave(
        fr, seeds, robots, state, wave_ts=21600.0, recrawl_sources=True
    )
    assert {r["url"] for r in wave2.collect()} == {
        "https://www.h.test/feed", "https://www.h.test/", "https://www.h.test/a1"
    }
    # drain mode (default): the clock is ignored even when not due
    wave3 = build_wave(fr, seeds, robots, state, wave_ts=60.0)
    assert len(wave3.collect()) == 3


def test_rot47_roundtrip_and_jvm_parity(spark):
    samples = ["Hello, World!", "spark{}[]", "123 abc XYZ ~!", ""]
    for s in samples:
        assert rot47(rot47(s)) == s
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["o"] for r in df.select(rot47_expr(F.col("s")).alias("o")).collect()]
    assert got == [rot47(s) for s in samples]
    assert rot47("Hello") == "w6==@"  # known ROT47 vector


def test_registered_domain_psl_semantics(spark):
    cases = {
        "news.example.co.uk": "example.co.uk",
        "www.example.co.uk": "example.co.uk",
        "a.b.paper.com.au": "paper.com.au",
        "blog.example.com": "example.com",
        "myblog.substack.com": "myblog.substack.com",   # platform kept
        "sub.myblog.substack.com": "myblog.substack.com",
        "192.168.0.1": "192.168.0.1",                   # IP passthrough
        "example.org": "example.org",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registered_domain_expr(F.col("h")).alias("d")
        ).collect()
    }
    for h, want in cases.items():
        assert got[h] == want, h
        assert registered_domain(h) == want, h  # python twin parity


def test_export_with_checksums(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tbl"))
    t.overwrite(
        spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k long, v string")
    )
    dest = str(tmp_path / "export1")
    manifest = t.export_version(dest)
    assert manifest["row_count"] == 100
    assert manifest["files"], "no files recorded"
    assert all(len(m["sha256"]) == 64 for m in manifest["files"].values())
    assert LakeTable.verify_export(dest)
    # tamper → verification fails
    name = next(iter(manifest["files"]))
    with open(f"{dest}/{name}", "r+b") as f:
        f.seek(10)
        f.write(b"\x00\x01")
    assert not LakeTable.verify_export(dest)
