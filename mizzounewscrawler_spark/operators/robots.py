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


def _parse_robots_body(body: str) -> list[dict]:
    """RFC 9309 group parser for ONE robots.txt body → one dict per
    user-agent: ``{user_agent, disallow[], allow[], crawl_delay}``.

    Semantics: consecutive ``User-agent`` lines open a group that shares
    the rule lines that follow; field names are case-insensitive and
    ``#`` comments are stripped; empty ``Disallow:`` values are ignored
    (allow-all); ``Crawl-delay`` is the de-facto extension every major
    crawler honors.  ``*``/``$`` path wildcards are carried through
    verbatim as prefixes (the fixture semantics downstream; a consumer
    wanting full wildcard matching translates them to a regex at its own
    matching point).  An agent named by several groups gets the UNION of
    their rules (RFC 9309 §2.2.1)."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    rules_seen = False  # a UA line after rules starts a NEW group
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if rules_seen:
                current = []
                rules_seen = False
            agent = value.lower()
            current.append(agent)
            groups.setdefault(
                agent,
                {"user_agent": agent, "disallow": [], "allow": [],
                 "crawl_delay": None},
            )
        elif field in ("disallow", "allow", "crawl-delay"):
            rules_seen = True
            if not current:
                continue  # rules before any user-agent line: ignored
            for agent in current:
                g = groups[agent]
                if field == "disallow" and value:
                    g["disallow"].append(value)
                elif field == "allow" and value:
                    g["allow"].append(value)
                elif field == "crawl-delay":
                    try:
                        g["crawl_delay"] = float(value)
                    except ValueError:
                        pass
    return list(groups.values())


ROBOTS_RULES_SCHEMA = (
    "host string, user_agent string, disallow array<string>, "
    "allow array<string>, crawl_delay double"
)


def parse_robots_txt(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Raw fetched robots.txt bodies ``(host, body)`` → the rules table
    ``apply_robots`` consumes (one row per (host, user-agent group)).

    Arrow-batched ``mapInPandas``; robots bodies are small and one-per-
    host, so this is dimension-sized work — run it once per robots
    refresh cycle, not per wave."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["host", "user_agent", "disallow", "allow", "crawl_delay"]
        for pdf in batches:
            rows = [
                {"host": h, **g}
                for h, b in zip(pdf[host_col], pdf[body_col])
                for g in _parse_robots_body(b or "")
            ]
            yield pd.DataFrame(rows, columns=cols)

    return bodies.mapInPandas(run, ROBOTS_RULES_SCHEMA)
