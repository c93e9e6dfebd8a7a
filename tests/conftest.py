"""Shared fixtures: one SparkSession per test session (startup ~20 s),
a small deterministic synthetic web, and its pandas twin."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mizzounewscrawler_spark.session import build_session  # noqa: E402
from mizzounewscrawler_spark.sources.generator import generate_web  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(parallelism=4, shuffle_partitions=8, app_name="mnc-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def web():
    """t1-scale fixture web: 8 hosts, ~400 pages (FIXTURES.md §6)."""
    return generate_web(seed=42, n_hosts=8, target_pages=400)


@pytest.fixture(scope="session")
def web_spark(spark, web):
    pages = spark.createDataFrame(web.pages)
    seeds = spark.createDataFrame(web.seeds)
    robots = spark.createDataFrame(web.robots)
    return pages, seeds, robots
