"""robots.txt enforcement (RFC 9309 semantics, deterministic).

The reference implements NO robots.txt handling (SURVEY.md §0 — grep hits
only archived docs); the north rule adds it as a new requirement.  Rules
live in a ``robots`` table (host, user_agent, disallow array<string>,
crawl_delay double) per FIXTURES.md §3.

Semantics implemented (RFC 9309 §2.2, simplified to the fixture shape):
- a URL is disallowed iff any ``disallow`` prefix is a prefix of its path
  (allow-rules/longest-match omitted — fixtures carry disallow-only rule
  sets; the column expression generalizes by adding an allow array and a
  greatest-length comparison);
- empty disallow list ⇒ everything allowed;
- ``crawl_delay`` feeds the per-host politeness budget (scheduler).

Enforcement point: **enqueue time** — a disallowed URL is never admitted to
the frontier (it still enters the URL-seen set so it is never reconsidered).
This is both the cheap place at scale (one broadcast join per discovery
batch instead of re-checking every wave) and the deterministic one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def path_from_surt(surt: Column) -> Column:
    """Path (+ ?query) part of a SURT string — everything after ')'."""
    p = F.substring_index(surt, ")", -1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_allowed_expr(path: Column, disallow: Column) -> Column:
    """True iff no disallow prefix matches ``path`` (NULL rules ⇒ allowed)."""
    blocked = F.exists(disallow, lambda d: path.startswith(d))
    return F.when(disallow.isNull(), F.lit(True)).otherwise(~blocked)


def apply_robots(
    candidates: DataFrame,
    robots: DataFrame,
    host_col: str = "host",
    surt_col: str = "url_surt",
) -> DataFrame:
    """Add ``robots_allowed`` by broadcast-joining the rules table.

    The robots table is one row per (host, user_agent) — tiny relative to the
    frontier even at 10^10 URLs (#hosts ≪ #URLs), so broadcast is right.
    """
    rules = robots.where(F.col("user_agent") == "*").select(
        F.col("host").alias("_r_host"),
        F.col("disallow").alias("_r_disallow"),
        F.col("crawl_delay").alias("robots_crawl_delay"),
    )
    joined = candidates.join(
        F.broadcast(rules), candidates[host_col] == rules["_r_host"], "left"
    ).drop("_r_host")
    path = path_from_surt(F.col(surt_col))
    return joined.withColumn(
        "robots_allowed", robots_allowed_expr(path, F.col("_r_disallow"))
    ).drop("_r_disallow")


def robots_allowed_py(path: str, disallow: list[str] | None) -> bool:
    """Pure-Python twin for the sequential simulator."""
    if not disallow:
        return True
    return not any(path.startswith(d) for d in disallow)
