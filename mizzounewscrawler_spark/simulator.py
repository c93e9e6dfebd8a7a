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
    FREQ_DAYS,
    FREQ_DEFAULT_DAYS,
    MAX_PER_HOST_PER_WAVE,
    SENSITIVITY_CAPTCHA_DELTA,
    SENSITIVITY_DECAY_WAVES,
    SENSITIVITY_FAILURE_DELTA,
    SENSITIVITY_MAX,
    SOURCE_PAUSE_S,
    TIER_DELAY_S,
)


def _cadence_days(freq: str | None) -> float:
    return FREQ_DAYS.get(freq, FREQ_DEFAULT_DAYS)


def _pause_threshold(cadence: float) -> int:
    if cadence <= 1.0:
        return 7
    if cadence <= 7.0:
        return 5
    return 3


def _feed_retry_window_s(cadence: float) -> float:
    return min(max(cadence * 2, 2.0), 7.0) * 86400.0

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
    bucket_sweep: int = 0,
    recrawl_sources: bool = False,
) -> SimResult:
    # fetch by canonical SURT (mirrors operators/extraction.fetch_and_extract:
    # variant frontier URLs resolve to the canonical stored resource); the
    # store is canonical-unique per surt by fixture contract
    page_html: dict[str, str] = {}
    for r in pages.itertuples(index=False):
        s = surt_py(r.url)
        if s is not None and s not in page_html:
            page_html[s] = bytes(r.html).decode("utf-8", errors="replace")
    base_sens = dict(zip(seeds["host"], seeds["bot_sensitivity"]))
    cadence = (
        {h: _cadence_days(f) for h, f in zip(seeds["host"], seeds["frequency"])}
        if "frequency" in seeds.columns
        else {h: FREQ_DEFAULT_DAYS for h in seeds["host"]}
    )
    sens = dict(base_sens)  # P8: adapted tier, starts at base
    sens_event_wave: dict[str, int] = {}
    feed_retry_until: dict[str, float] = {}
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

    def _is_source(surt_s: str) -> bool:
        # P1 recrawl unit: feed or homepage (scheduler.is_source_url_expr);
        # a homepage SURT has an empty path and ends at the ")" delimiter
        return surt_s.endswith(")/feed") or surt_s.endswith(")")

    # host politeness state
    consec: dict[str, int] = {}
    backoff_until: dict[str, float] = {}
    # P1 per-host cadence clock (engine host_state.source_next_due)
    source_next_due: dict[str, float] = {}

    for wave in range(max_waves):
        if not frontier:
            break
        wave_ts = wave * wave_duration

        # group frontier by host, excluding hosts in backoff; P11: feed URLs
        # of a host inside its RSS retry window sit out (host keeps crawling)
        by_host: dict[str, list[tuple[int, str, str, int, int]]] = {}
        for h, (url, s, host, prio, depth) in frontier.items():
            # bucket sweep: Python % matches Spark pmod for negative hashes
            if bucket_sweep > 0 and h % bucket_sweep != wave % bucket_sweep:
                continue
            if backoff_until.get(host, -math.inf) > wave_ts:
                continue
            if (
                s.endswith(")/feed")
                and feed_retry_until.get(host, -math.inf) > wave_ts
            ):
                continue
            # P1 (recrawl mode only): source URLs sit out until the host's
            # cadence clock is due.  In drain mode fetched sources leave the
            # frontier permanently, and the gate must NOT apply — it would
            # starve a not-yet-fetched source (e.g. the homepage when only
            # the feed fit wave 0's politeness budget) for a whole cadence.
            if (
                recrawl_sources
                and _is_source(s)
                and source_next_due.get(host, -math.inf) > wave_ts
            ):
                continue
            by_host.setdefault(host, []).append((h, url, s, prio, depth))

        selected: list[tuple[int, str, str, int, int]] = []
        for host, cands in by_host.items():
            delay_tier = TIER_DELAY_S[sens.get(host, 5)]  # P8 adapted tier
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
        wave_captcha: dict[str, int] = {}
        wave_feed_ok: dict[str, int] = {}
        wave_feed_fail: dict[str, int] = {}
        wave_src: dict[str, int] = {}  # P1 source attempts (ok or not)
        discovered: list[tuple[str, int]] = []  # (raw url, depth)
        for seq, (h, url, s, prio, depth) in enumerate(selected, start=1):
            res.order.append((wave, seq, s))
            host = _host_of_surt(s)
            doc = page_html.get(s)
            if doc is None:
                status, text = "failed", None
            else:
                is_feed = doc.lstrip().startswith("<?xml") or "<rss" in doc[:200]
                if is_feed:
                    links = fresh_feed_links(doc)  # F6 recency at discovery
                    text, status = "", "feed"
                else:
                    text, _method = extract_text(doc)
                    sd = extract_structured(doc, url=url or "")
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
            if status == "proxy_blocked":  # P8 captcha signal
                wave_captcha[host] = wave_captcha.get(host, 0) + 1
            if s.endswith(")/feed"):  # P11 feed event (URL-shape flag)
                tgt = wave_feed_ok if ok else wave_feed_fail
                tgt[host] = tgt.get(host, 0) + 1
            text_hash = (
                hashlib.sha256(text.encode("utf-8")).hexdigest()
                if text is not None and text != ""
                else None
            )
            res.articles[url] = (status, text_hash)
            if _is_source(s):
                wave_src[host] = wave_src.get(host, 0) + 1
            if recrawl_sources and _is_source(s):
                continue  # P1: source URLs stay in the frontier (cadence-gated)
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

        # host state update (mirrors operators/scheduler.update_host_state)
        evented = set(wave_ok) | set(wave_fail)
        for host in evented:
            cad = cadence.get(host, FREQ_DEFAULT_DAYS)
            base = base_sens.get(host, 5)
            cur = sens.get(host, base)
            # P8 sensitivity adaptation: captcha beats plain failure
            if wave_captcha.get(host, 0) > 0:
                sens[host] = min(cur + SENSITIVITY_CAPTCHA_DELTA, SENSITIVITY_MAX)
                sens_event_wave[host] = wave
            elif wave_fail.get(host, 0) > 0:
                sens[host] = min(cur + SENSITIVITY_FAILURE_DELTA, SENSITIVITY_MAX)
                sens_event_wave[host] = wave
            elif (
                host in sens_event_wave
                and wave - sens_event_wave[host] >= SENSITIVITY_DECAY_WAVES
            ):
                # success-only wave can still decay a previously-bumped tier
                sens[host] = max(cur - 1, base)
                sens_event_wave[host] = wave
            # P11 RSS retry window: any feed success clears it
            if wave_feed_ok.get(host, 0) > 0:
                feed_retry_until.pop(host, None)
            elif wave_feed_fail.get(host, 0) > 0:
                feed_retry_until[host] = wave_ts + _feed_retry_window_s(cad)
            # failure backoff + P10 adaptive source pause
            if wave_ok.get(host, 0) > 0:
                consec[host] = 0
                backoff_until.pop(host, None)
            else:
                n = consec.get(host, 0) + wave_fail.get(host, 0)
                consec[host] = n
                if n >= _pause_threshold(cad):
                    backoff_until[host] = wave_ts + SOURCE_PAUSE_S
                elif n >= FAILURE_PAUSE_AFTER:
                    backoff_until[host] = wave_ts + FAILURE_PAUSE_S
                else:
                    backoff_until[host] = wave_ts + min(
                        BACKOFF_BASE_S * (2 ** (n - 1)), BACKOFF_CAP_S
                    )
        # P1: any wave touching a host's source URLs re-arms its cadence
        # clock (engine update_host_state: _src_evt > 0 → wave_ts + cad·86400)
        for host, n in wave_src.items():
            if n > 0:
                source_next_due[host] = wave_ts + cadence.get(
                    host, FREQ_DEFAULT_DAYS
                ) * 86400.0
        # P8 decay: a quiet streak of SENSITIVITY_DECAY_WAVES waves steps the
        # adapted tier back toward base (engine: quiet_for >= DECAY branch)
        for host, ew in list(sens_event_wave.items()):
            if host in evented:
                continue
            if wave - ew >= SENSITIVITY_DECAY_WAVES:
                sens[host] = max(
                    sens.get(host, base_sens.get(host, 5)) - 1,
                    base_sens.get(host, 5),
                )
                sens_event_wave[host] = wave
        res.waves_run += 1
    return res
