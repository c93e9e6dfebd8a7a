"""mizzounewscrawler_spark — a from-scratch PySpark-native crawl-frontier engine.

A DataFrame-first re-expression of the capabilities of the reference news
crawler (MachaaX/MizzouNewsCrawler, surveyed in SURVEY.md): URL
canonicalization + hashing, frontier dedup (exact + Bloom/cuckoo),
politeness-aware wave scheduling (robots.txt, per-host budgets, backoff),
vectorized Arrow extraction, snapshot-versioned state with resume, and the
downstream analytic/report operators — all built on public PySpark 4.x APIs.

Nothing here is a port: the reference's sequential per-row loops
(src/crawler/discovery.py:3623, src/cli/commands/extraction.py:1203,
orchestration/continuous_processor.py:589) are restated as declarative
DataFrame plans so Catalyst/AQE choose the physical strategy.
"""

__version__ = "0.1.0"
