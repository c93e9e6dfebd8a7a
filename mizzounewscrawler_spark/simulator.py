"""Sequential reference-faithful crawl simulator (pure Python).

The reference crawler is a sequential per-row loop; this simulator IS that
shape — one URL at a time, one dict/set state — but follows the engine's
deterministic ordering spec (priority DESC, url_hash ASC — the documented
replacement for the reference's ``ORDER BY RANDOM()``, SURVEY.md §7 risk 2)
and the same politeness budget.  The Spark engine (crawl.py) must reproduce
this simulator's URL-seen set, crawl order, and per-URL article text/status
EXACTLY (north rule); tests/test_crawl_parity.py asserts it.

Shares the pure functions (canonicalize/surt/xxhash64, HTML extraction,
robots matching) with the engine so parity is about *dataflow semantics*,
not re-implemented string munging — while the engine's hot paths use the
independently-implemented native column expressions (verified equal to
these pure functions in tests/test_urls.py).
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field

import pandas as pd

from mizzounewscrawler_spark.functions.html import (
    extract_author,
    extract_links,
    extract_structured,
    extract_text,
    extract_title,
    fresh_feed_links,
    is_challenge_page,
)
from mizzounewscrawler_spark.functions.urls import surt as surt_py
from mizzounewscrawler_spark.functions.urls import url_hash as url_hash_py
from mizzounewscrawler_spark.operators.robots import robots_allowed_py
from mizzounewscrawler_spark.operators.scheduler import (
    BACKOFF_BASE_S,
    BACKOFF_CAP_S,
    FAILURE_PAUSE_AFTER,
    FAILURE_PAUSE_S,
    MAX_PER_HOST_PER_WAVE,
    TIER_DELAY_S,
)

_WIRE_RE = re.compile(r"(?i)^(the\s+)?(associated press|ap|reuters|afp|cnn newsource)\b")


@dataclass
class SimResult:
    seen: set[str] = field(default_factory=set)  # surts
    order: list[tuple[int, int, str]] = field(default_factory=list)  # (wave, seq, surt)
    articles: dict[str, tuple[str, str | None]] = field(default_factory=dict)
    # url -> (status, sha256(text) or None)
    waves_run: int = 0


def _host_of_surt(s: str) -> str:
    return ".".join(reversed(s.split(")", 1)[0].split(",")))


def _path_of_surt(s: str) -> str:
    p = s.split(")", 1)[1]
    return p if p else "/"


def simulate_crawl(
    pages: pd.DataFrame,
    seeds: pd.DataFrame,
    robots: pd.DataFrame,
    max_waves: int = 10,
    wave_duration: float = 60.0,
    max_per_host: int = MAX_PER_HOST_PER_WAVE,
    max_depth: int = 10,
) -> SimResult:
    page_html = {
        r.url: bytes(r.html).decode("utf-8", errors="replace")
        for r in pages.itertuples(index=False)
    }
    sens = dict(zip(seeds["host"], seeds["bot_sensitivity"]))
    robots_by_host = {
        r.host: (list(r.disallow) if r.disallow is not None else [], r.crawl_delay)
        for r in robots[robots["user_agent"] == "*"].itertuples(index=False)
    }
    allowed_hosts = set(seeds["host"])

    res = SimResult()
    # frontier: url_hash -> (url, surt, host, priority, depth)
    frontier: dict[int, tuple[str, str, str, int, int]] = {}

    def priority_of(surt_s: str) -> int:
        return 2 if surt_s.endswith(")/feed") else 1

    def enqueue_seed(url: str) -> None:
        s = surt_py(url)
        if s is None or s in res.seen:
            return
        res.seen.add(s)
        h = url_hash_py(s)
        frontier[h] = (url, s, _host_of_surt(s), priority_of(s), 0)

    for r in seeds.itertuples(index=False):
        enqueue_seed(f"https://www.{r.host}/")
        for fu in r.feed_urls:
            enqueue_seed(fu)

    # host politeness state
    consec: dict[str, int] = {}
    backoff_until: dict[str, float] = {}

    for wave in range(max_waves):
        if not frontier:
            break
        wave_ts = wave * wave_duration

        # group frontier by host, excluding hosts in backoff
        by_host: dict[str, list[tuple[int, str, str, int, int]]] = {}
        for h, (url, s, host, prio, depth) in frontier.items():
            if backoff_until.get(host, -math.inf) > wave_ts:
                continue
            by_host.setdefault(host, []).append((h, url, s, prio, depth))

        selected: list[tuple[int, str, str, int, int]] = []
        for host, cands in by_host.items():
            delay_tier = TIER_DELAY_S[sens.get(host, 5)]
            rdelay = robots_by_host.get(host, ([], 0.0))[1]
            delay = max(delay_tier, rdelay or 0.0)
            budget = max(1, min(max_per_host, int(wave_duration // delay)))
            cands.sort(key=lambda c: (-c[3], c[0]))  # priority desc, url_hash asc
            selected.extend(cands[:budget])
        if not selected:
            res.waves_run += 1
            continue  # clock advances; backoffs expire
        selected.sort(key=lambda c: (-c[3], c[0]))

        wave_ok: dict[str, int] = {}
        wave_fail: dict[str, int] = {}
        discovered: list[tuple[str, int]] = []  # (raw url, depth)
        for seq, (h, url, s, prio, depth) in enumerate(selected, start=1):
            res.order.append((wave, seq, s))
            host = _host_of_surt(s)
            doc = page_html.get(url)
            if doc is None:
                status, text = "failed", None
            else:
                is_feed = doc.lstrip().startswith("<?xml") or "<rss" in doc[:200]
                if is_feed:
                    links = fresh_feed_links(doc)  # F6 recency at discovery
                    text, status = "", "feed"
                else:
                    text, _method = extract_text(doc)
                    sd = extract_structured(doc)
                    author = extract_author(doc) or sd["author"]
                    if is_challenge_page(doc):
                        status = "proxy_blocked"
                    elif sd["is_wire"]:  # C17 stage 1: structured data
                        status = "wire"
                    elif author and _WIRE_RE.search(author):  # stage 2: byline
                        status = "wire"
                    elif len(text.strip()) < 150:
                        status = "paywall"
                    else:
                        status = "extracted"
                    links = extract_links(doc, url)
                if depth + 1 <= max_depth:
                    discovered.extend((u, depth + 1) for u in links)
            ok = status in ("extracted", "wire", "paywall", "feed")
            (wave_ok if ok else wave_fail)[host] = (
                (wave_ok if ok else wave_fail).get(host, 0) + 1
            )
            text_hash = (
                hashlib.sha256(text.encode("utf-8")).hexdigest()
                if text is not None and text != ""
                else None
            )
            res.articles[url] = (status, text_hash)
            del frontier[h]

        # discovery → canonical dedup (winner = min (depth, url) per hash)
        per_hash: dict[int, tuple[int, str, str]] = {}
        for url, depth in discovered:
            s = surt_py(url)
            if s is None:
                continue
            h = url_hash_py(s)
            cand = (depth, url, s)
            if h not in per_hash or cand < per_hash[h]:
                per_hash[h] = cand
        for h, (depth, url, s) in sorted(per_hash.items()):
            host = _host_of_surt(s)
            if host not in allowed_hosts:
                continue
            if s in res.seen:
                continue
            res.seen.add(s)  # disallowed URLs are seen too (enqueue-time rule)
            disallow, _ = robots_by_host.get(host, ([], 0.0))
            if not robots_allowed_py(_path_of_surt(s), disallow):
                continue
            frontier[h] = (url, s, host, priority_of(s), depth)

        # host state update
        for host in set(wave_ok) | set(wave_fail):
            if wave_ok.get(host, 0) > 0:
                consec[host] = 0
                backoff_until.pop(host, None)
            else:
                n = consec.get(host, 0) + wave_fail.get(host, 0)
                consec[host] = n
                if n >= FAILURE_PAUSE_AFTER:
                    backoff_until[host] = wave_ts + FAILURE_PAUSE_S
                else:
                    backoff_until[host] = wave_ts + min(
                        BACKOFF_BASE_S * (2 ** (n - 1)), BACKOFF_CAP_S
                    )
        res.waves_run += 1
    return res
