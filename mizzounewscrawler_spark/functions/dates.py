"""Publish-date extraction & parsing (C9/C18) — deterministic, pinned clock.

Reference behavior being re-expressed:
- ``guess_publication_date`` (/root/reference/src/mcmetadata/dates.py:11-32):
  htmldate over the raw html with a max-future-date guard of now()+90 days
  (/root/reference/src/mcmetadata/__init__.py:18,145).  ``now()`` is a
  nondeterminism hazard (SURVEY.md §7 risk 1), so the engine pins the clock
  to ``REFERENCE_TS`` — the same fixed timestamp the synthetic web derives
  from — and the guard becomes ``REFERENCE_TS + 90 days``.
- feed pubDate parsing (/root/reference/src/crawler/discovery.py:63-94):
  dateutil with RFC-822/ISO fallbacks → here an explicit ordered format
  list (deterministic; no locale).
- recency window (/root/reference/src/crawler/discovery.py:1951-1956):
  candidates older than ``days_back`` (default 7) are dropped at discovery
  time; missing dates pass.

These pure functions are shared by the Arrow extraction UDF, the sequential
simulator, and the fixture generator — the same three-way-parity contract
as functions/html.py.
"""

from __future__ import annotations

import datetime as dt
import re

# The pinned "now" of the whole synthetic-web universe (generator warc_ts
# values are offsets below this).  On a production crawl this is the batch's
# logical timestamp, injected per run — never wall clock.
REFERENCE_TS = dt.datetime(2024, 1, 15, 12, 0, 0)
MAX_FUTURE_DAYS = 90  # reference mcmetadata/__init__.py:18
RECENCY_DAYS_BACK = 7  # reference discovery.py:236,263

# ordered, locale-free parse attempts (reference _parse_date's dateutil
# fallbacks made explicit)
_FORMATS = (
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%a, %d %b %Y %H:%M:%S %z",  # RFC 822 (RSS pubDate)
    "%a, %d %b %Y %H:%M:%S",
    "%d %b %Y %H:%M:%S",
    "%d %b %Y",
)


from functools import lru_cache


@lru_cache(maxsize=65536)
def parse_date(raw: str | None) -> dt.datetime | None:
    """First-match parse over the pinned format list; tz-aware values are
    converted to naive UTC (the reference stores naive UTC,
    /root/reference/src/models/__init__.py:77).  Memoized per executor
    process: publish dates repeat heavily within a crawl (one value per
    article-day), and strptime over an 8-format ladder was ~12%% of the
    extraction kernel; datetime returns are immutable so sharing is safe.
    """
    if not raw:
        return None
    s = raw.strip()
    # normalize Zulu suffix for %z
    s = re.sub(r"Z$", "+0000", s)
    # %z needs +HHMM, not +HH:MM on some platforms — normalize
    s = re.sub(r"([+-]\d{2}):(\d{2})$", r"\1\2", s)
    for fmt in _FORMATS:
        try:
            d = dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return d
    return None


def guard_future(d: dt.datetime | None, now: dt.datetime = REFERENCE_TS) -> dt.datetime | None:
    """Reference max-future-date guard: dates past now+90d are extraction
    artifacts → None (dates.py:11-32)."""
    if d is None:
        return None
    if d > now + dt.timedelta(days=MAX_FUTURE_DAYS):
        return None
    return d


def is_recent(d: dt.datetime | None, now: dt.datetime = REFERENCE_TS,
              days_back: int = RECENCY_DAYS_BACK) -> bool:
    """F6/P12 recency window: missing dates pass (discovery.py:1951-1956)."""
    if d is None:
        return True
    return d >= now - dt.timedelta(days=days_back)
