"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog lives in ``mizzounewscrawler_spark.plans.relational``; each
entry names the SURVEY.md §2 operator(s) it exercises.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mizzounewscrawler_spark.plans.relational import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the county-report-style
    multi-join (SURVEY.md §3.3) — facts ⋈ broadcast dims ⋈ agg."""
    from mizzounewscrawler_spark.plans.relational import q_report_join

    return q_report_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {spec.name: spec.spark_fn for spec in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each oracle-checkable query."""
    return {spec.name: spec.sql for spec in CATALOG if spec.sql is not None}
