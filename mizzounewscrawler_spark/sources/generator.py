"""Deterministic synthetic-web generator (pages / seeds / robots tables).

Per FIXTURES.md §1-3: Common-Crawl-style ``pages`` with Zipf-skewed host
sizes (hot-host skew for the salting story), per-host link graphs (so link
discovery feeds the frontier), duplicate content across URLs (content-hash
dedup), tracking-param URL variants (canonicalization dedup), challenge and
paywall pages, RSS feeds, and robots.txt rules with disallowed-but-linked
paths (to prove enforcement).

Everything is seeded (seed=42 convention) and wall-clock-free: timestamps
derive from a fixed ``REFERENCE_TS`` (the reference's future-date guard used
``now()`` — /root/reference/src/mcmetadata/__init__.py:18,145 — which we pin,
SURVEY.md §7 risk 1).

Two drivers over the same per-host pure function:
- :func:`generate_web` — pure pandas, used by tests and the sequential
  simulator (small scale);
- :func:`generate_web_spark` — ``mapInPandas`` over a host-spec DataFrame,
  used by the benchmark (distributed generation; 600k pages in seconds and
  the same code path a 100 TB fixture would use).
"""

from __future__ import annotations

import datetime as dt
import os
import random
from dataclasses import dataclass

import pandas as pd

from mizzounewscrawler_spark.functions.dates import REFERENCE_TS
from mizzounewscrawler_spark.functions.html import extract_text

# Benchmark realism knob: extra KB of article body per page (0 = fixture
# default).  Read once at import; local-mode python workers inherit the env.
_FILLER_KB = int(os.environ.get("GEN_FILLER_KB", "0"))

_VOCAB = (
    "council city mayor budget vote school district board river park police "
    "fire county election report student teacher game season team coach win "
    "storm weather road bridge project plan meeting public health hospital "
    "farm market store local business owner street festival music downtown"
).split()
_STOP = "the of and a to in is was for on that with as it at by from".split()

FREQUENCIES = ["daily", "weekly", "biweekly", "monthly"]
CITIES = ["Columbia", "Springfield", "Liberty", "Fulton", "Mexico", "Rolla"]
COUNTIES = ["Boone", "Greene", "Clay", "Callaway", "Audrain", "Phelps"]


def _sentence(rng: random.Random) -> str:
    n = rng.randint(8, 16)
    words = []
    for i in range(n):
        pool = _STOP if rng.random() < 0.4 else _VOCAB
        words.append(rng.choice(pool))
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, sentences: int) -> str:
    return " ".join(_sentence(rng) for _ in range(sentences))


def host_name(i: int) -> str:
    return f"site{i:04d}.news.test"


@dataclass
class HostSpec:
    host: str
    host_idx: int
    n_articles: int
    bot_sensitivity: int
    crawl_delay: float
    has_robots: bool
    frequency: str
    # total hosts in the web (for the homepage's cross-host link); 0 = unknown
    n_hosts: int = 0


def make_host_specs(seed: int, n_hosts: int, target_pages: int) -> list[HostSpec]:
    """Zipf-weighted page allocation across hosts (rank-1 host is hot)."""
    weights = [1.0 / (r + 1) for r in range(n_hosts)]
    total = sum(weights)
    specs = []
    for i in range(n_hosts):
        n_articles = max(5, round(target_pages * weights[i] / total))
        specs.append(
            HostSpec(
                host=host_name(i),
                host_idx=i,
                n_articles=n_articles,
                bot_sensitivity=1 + (i % 10),
                crawl_delay=[0.5, 1.0, 2.0, 5.0, 10.0][i % 5],
                has_robots=(i % 4 == 0),
                frequency=FREQUENCIES[i % len(FREQUENCIES)],
                n_hosts=n_hosts,
            )
        )
    return specs


def _pub_iso(k: int) -> str:
    """Article k's publish timestamp (pinned clock − k minutes), ISO."""
    return (REFERENCE_TS - dt.timedelta(seconds=k * 60)).strftime(
        "%Y-%m-%dT%H:%M:%S"
    )


def _is_wire_article(k: int) -> bool:
    """Wire-service syndications detectable only via JSON-LD provider
    (stage 1 of the C17 cascade — the byline stays a local reporter).
    k≡5 (mod 19) puts the first one (k=5) in every host's homepage/feed
    "recent" list, so short politeness-bounded crawls still fetch some."""
    return k % 19 == 5


def _boiler_html(host: str) -> tuple[str, str]:
    """Per-host boilerplate chrome injected into every article — the C14
    cleaner's mining target (repeated across all of a host's articles)."""
    return (
        f"<p>Sign up for the {host} morning newsletter to get local "
        f"stories delivered to your inbox first.</p>",
        f"<p>Copyright {host} - contact our newsroom for reprint "
        f"permissions and licensing questions.</p>",
    )


def _article_html(
    title: str, author: str, k: int, body: str, rel_links: str, host: str = ""
) -> str:
    """Article page with publish-date meta (C9) and, for wire syndications,
    a JSON-LD block carrying provider + datePublished (C11/C17 stage 1).
    Body is wrapped in per-host boilerplate chrome when ``host`` is given
    (the C14 cleaner mines and strips it)."""
    if host:
        top, bottom = _boiler_html(host)
        body = top + body + bottom
    head = (
        f"<title>{title}</title>"
        f'<meta name="author" content="{author}">'
        f'<meta property="article:published_time" content="{_pub_iso(k)}">'
    )
    if _is_wire_article(k):
        head += (
            '<script type="application/ld+json">'
            f'{{"headline": "{title}", "datePublished": "{_pub_iso(k)}", '
            '"provider": {"name": "Associated Press"}}'
            "</script>"
        )
    return (
        f"<html><head>{head}</head>"
        f"<body><article>{body}</article><nav>{rel_links}</nav></body></html>"
    )


def _feed_xml(base: str, recent_urls: list[str]) -> str:
    """RSS feed: fresh items (pubDate = the article's publish minute) plus
    two stale archive items 30 days old — the F6 recency window must drop
    those at discovery time (their URLs are not in the page store, so a
    recency regression shows up as scheduled-then-failed fetches)."""
    items = "".join(
        f"<item><title>i{j}</title><link>{u}</link>"
        f"<pubDate>{(REFERENCE_TS - dt.timedelta(seconds=j * 60)).strftime('%a, %d %b %Y %H:%M:%S +0000')}</pubDate>"
        f"</item>"
        for j, u in enumerate(recent_urls)
    )
    items += "".join(
        f"<item><title>old{j}</title><link>{base}/archive/old-{j}.html</link>"
        f"<pubDate>{(REFERENCE_TS - dt.timedelta(days=30 + j)).strftime('%a, %d %b %Y %H:%M:%S +0000')}</pubDate>"
        f"</item>"
        for j in range(2)
    )
    return f'<?xml version="1.0"?><rss><channel>{items}</channel></rss>'


def gen_host_pages(spec: HostSpec, seed: int) -> list[dict]:
    """All pages for one host: homepage, 2 sections, feed, articles (+
    variants/dups/challenge/paywall/private).  Deterministic per (host, seed)."""
    rng = random.Random(f"{seed}:{spec.host}")
    base = f"https://www.{spec.host}"
    rows: list[dict] = []
    article_urls: list[str] = []
    private_urls: list[str] = []

    def add(url: str, html: str, offset_s: int) -> None:
        text, _ = extract_text(html)
        rows.append(
            {
                "url": url,
                "warc_ts": REFERENCE_TS - dt.timedelta(seconds=offset_s),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en",
            }
        )

    # -- articles ----------------------------------------------------------
    prev_body: str | None = None
    for k in range(spec.n_articles):
        day = 1 + (k % 28)
        url = f"{base}/2024/01/{day:02d}/story-{k}.html"
        title = f"Story {k} on {spec.host}"
        author = f"Reporter {k % 7}"
        if k % 23 == 21:
            # challenge page (reference proxy-challenge detect, extraction.py:1273)
            html = (
                "<html><head><title>Just a moment...</title></head>"
                "<body><p>Checking your browser before accessing.</p></body></html>"
            )
        elif k % 17 == 13:
            # paywall page: real content is just a subscription pitch, but
            # per-host chrome inflates raw length past the 150-char gate —
            # only the C14 cleaner's cleaned-text gate catches it
            top, bottom = _boiler_html(spec.host)
            html = (
                f"<html><head><title>{title}</title>"
                f'<meta property="article:published_time" content="{_pub_iso(k)}">'
                f"</head><body>"
                f"<article>{top}<p>Subscribe to read this story.</p>{bottom}"
                f"</article></body></html>"
            )
        else:
            if k % 13 == 12 and prev_body is not None:
                body = prev_body  # duplicate content, distinct URL
            else:
                body = "".join(
                    f"<p>{_paragraph(rng, rng.randint(3, 6))}</p>"
                    for _ in range(rng.randint(10, 22))
                )
                if _FILLER_KB > 0:
                    # benchmark realism knob ($GEN_FILLER_KB): pad articles
                    # toward real Common-Crawl page weight (30–100 KB) so the
                    # extraction UDF — the true hot path at 100 TB — carries
                    # realistic per-page cost.  Cheap to generate (block
                    # repetition), still fully parsed by extraction.
                    filler_p = f"<p>{_paragraph(rng, 4)}</p>"
                    reps = max(1, (_FILLER_KB * 1024) // len(filler_p))
                    body += filler_p * reps
                prev_body = body
            related = rng.sample(article_urls, min(3, len(article_urls)))
            rel_links = "".join(f'<a href="{u}">rel</a>' for u in related)
            html = _article_html(title, author, k, body, rel_links, spec.host)
        add(url, html, offset_s=k * 60)
        article_urls.append(url)

    # -- private pages (robots-disallowed but linked) ------------------------
    if spec.has_robots:
        for k in range(3):
            url = f"{base}/private/secret-{k}.html"
            body = "".join(
                f"<p>{_paragraph(rng, 3)}</p>" for _ in range(4)
            )
            add(
                url,
                f"<html><head><title>Private {k}</title></head>"
                f"<body><article>{body}</article></body></html>",
                offset_s=90000 + k,
            )
            private_urls.append(url)

    # -- sections ------------------------------------------------------------
    half = len(article_urls) // 2
    sections = {
        f"{base}/news": article_urls[:half],
        f"{base}/sports": article_urls[half:],
    }
    for surl, arts in sections.items():
        links = "".join(f'<a href="{u}">a</a>' for u in arts[:50])
        add(
            surl,
            f"<html><head><title>Section</title></head><body>{links}</body></html>",
            offset_s=30,
        )

    # -- homepage --------------------------------------------------------------
    recent = article_urls[: min(10, len(article_urls))]
    # tracking-param variants of some article links (canonicalization dedup)
    variant_links = [
        f"{u}?utm_source=homepage&fbclid=ZZ{j}"
        for j, u in enumerate(article_urls)
        if j % 7 == 5
    ]
    next_host = host_name(
        (spec.host_idx + 1) % spec.n_hosts if spec.n_hosts > 0 else 0
    )
    ext = f"https://www.{next_host}/"
    links = "".join(
        f'<a href="{u}">l</a>'
        for u in ([*sections.keys(), *recent, *variant_links, *private_urls, ext])
    )
    add(
        f"{base}/",
        f"<html><head><title>{spec.host}</title></head><body>{links}</body></html>",
        offset_s=10,
    )

    # -- RSS feed ---------------------------------------------------------------
    feed = _feed_xml(base, recent)
    rows.append(
        {
            "url": f"{base}/feed",
            "warc_ts": REFERENCE_TS - dt.timedelta(seconds=5),
            "html": feed.encode("utf-8"),
            "text": "",
            "lang": "en",
        }
    )
    return rows


@dataclass
class SyntheticWeb:
    pages: pd.DataFrame
    seeds: pd.DataFrame
    robots: pd.DataFrame


def _seeds_robots(specs: list[HostSpec]) -> tuple[pd.DataFrame, pd.DataFrame]:
    seeds = pd.DataFrame(
        {
            "source_id": [f"src-{s.host}" for s in specs],
            "host": [s.host for s in specs],
            "name": [f"The {s.host.split('.')[0].title()} Gazette" for s in specs],
            "frequency": [s.frequency for s in specs],
            "bot_sensitivity": [s.bot_sensitivity for s in specs],
            "feed_urls": [[f"https://www.{s.host}/feed"] for s in specs],
            "city": [CITIES[s.host_idx % len(CITIES)] for s in specs],
            "county": [COUNTIES[s.host_idx % len(COUNTIES)] for s in specs],
            "status": ["paused" if s.host_idx % 11 == 10 else "active" for s in specs],
        }
    )
    robots = pd.DataFrame(
        {
            "host": [s.host for s in specs],
            "user_agent": ["*"] * len(specs),
            "disallow": [
                ["/private/", "/tag/"] if s.has_robots else [] for s in specs
            ],
            "crawl_delay": [s.crawl_delay for s in specs],
        }
    )
    return seeds, robots


def generate_web(seed: int = 42, n_hosts: int = 20, target_pages: int = 2000) -> SyntheticWeb:
    """Pure-pandas deterministic web (tests / simulator scale)."""
    specs = make_host_specs(seed, n_hosts, target_pages)
    rows: list[dict] = []
    for spec in specs:
        rows.extend(gen_host_pages(spec, seed))
    seeds, robots = _seeds_robots(specs)
    return SyntheticWeb(pages=pd.DataFrame(rows), seeds=seeds, robots=robots)


def _article_url(base: str, k: int) -> str:
    return f"{base}/2024/01/{1 + (k % 28):02d}/story-{k}.html"


def _is_challenge(k: int) -> bool:
    return k % 23 == 21


def _is_paywall(k: int) -> bool:
    return k % 17 == 13


def _is_dup(k: int) -> bool:
    return k % 13 == 12


def _article_body(spec: HostSpec, seed: int, k: int) -> str:
    """Body of normal article k, seeded per (host, k) — chunk-independent.

    Duplicate articles (k%13==12) reuse the body of the last *normal*
    article before k (mirrors the sequential generator's prev_body chain).
    """
    if _is_dup(k):
        j = k - 1
        while j >= 0 and (_is_challenge(j) or _is_paywall(j) or _is_dup(j)):
            j -= 1
        if j >= 0:
            return _article_body(spec, seed, j)
    rng = random.Random(f"{seed}:{spec.host}:{k}")
    body = "".join(
        f"<p>{_paragraph(rng, rng.randint(3, 6))}</p>"
        for _ in range(rng.randint(10, 22))
    )
    if _FILLER_KB > 0:
        filler_p = f"<p>{_paragraph(rng, 4)}</p>"
        reps = max(1, (_FILLER_KB * 1024) // len(filler_p))
        body += filler_p * reps
    return body


def gen_host_pages_range(
    spec: HostSpec, seed: int, start_k: int, end_k: int
) -> list[dict]:
    """Articles k ∈ [start_k, end_k) for one host, plus the hub pages
    (homepage/sections/feed/private) when start_k == 0.

    Chunk-independent RNG (per-article seeding) so a Zipf-hot host's page
    set generates across MANY tasks — the generator eats its own skew
    medicine.  Content differs from the sequential fixture generator (which
    seeds one RNG per host); nothing compares the two corpora.
    """
    base = f"https://www.{spec.host}"
    rows: list[dict] = []

    def add(url: str, html: str, offset_s: int) -> None:
        text, _ = extract_text(html)
        rows.append(
            {
                "url": url,
                "warc_ts": REFERENCE_TS - dt.timedelta(seconds=offset_s),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en",
            }
        )

    for k in range(start_k, min(end_k, spec.n_articles)):
        url = _article_url(base, k)
        title = f"Story {k} on {spec.host}"
        author = f"Reporter {k % 7}"
        if _is_challenge(k):
            html = (
                "<html><head><title>Just a moment...</title></head>"
                "<body><p>Checking your browser before accessing.</p></body></html>"
            )
        elif _is_paywall(k):
            top, bottom = _boiler_html(spec.host)
            html = (
                f"<html><head><title>{title}</title>"
                f'<meta property="article:published_time" content="{_pub_iso(k)}">'
                f"</head><body>"
                f"<article>{top}<p>Subscribe to read this story.</p>{bottom}"
                f"</article></body></html>"
            )
        else:
            body = _article_body(spec, seed, k)
            rng = random.Random(f"{seed}:{spec.host}:{k}:rel")
            related = [
                _article_url(base, j)
                for j in (rng.sample(range(k), min(3, k)) if k > 0 else [])
            ]
            rel_links = "".join(f'<a href="{u}">rel</a>' for u in related)
            html = _article_html(title, author, k, body, rel_links, spec.host)
        add(url, html, offset_s=k * 60)

    if start_k > 0:
        return rows

    # -- hub pages (chunk 0 only) -------------------------------------------
    article_urls = [_article_url(base, k) for k in range(spec.n_articles)]
    private_urls: list[str] = []
    if spec.has_robots:
        hub_rng = random.Random(f"{seed}:{spec.host}:hub")
        for k in range(3):
            url = f"{base}/private/secret-{k}.html"
            body = "".join(f"<p>{_paragraph(hub_rng, 3)}</p>" for _ in range(4))
            add(
                url,
                f"<html><head><title>Private {k}</title></head>"
                f"<body><article>{body}</article></body></html>",
                offset_s=90000 + k,
            )
            private_urls.append(url)

    half = len(article_urls) // 2
    sections = {
        f"{base}/news": article_urls[:half],
        f"{base}/sports": article_urls[half:],
    }
    for surl, arts in sections.items():
        links = "".join(f'<a href="{u}">a</a>' for u in arts[:50])
        add(
            surl,
            f"<html><head><title>Section</title></head><body>{links}</body></html>",
            offset_s=30,
        )

    recent = article_urls[: min(10, len(article_urls))]
    variant_links = [
        f"{u}?utm_source=homepage&fbclid=ZZ{j}"
        for j, u in enumerate(article_urls)
        if j % 7 == 5
    ]
    # cross-host edge: homepage links to the NEXT host (wraps at n_hosts);
    # falls back to host 0 when the spec predates n_hosts plumbing
    next_host = host_name(
        (spec.host_idx + 1) % spec.n_hosts if spec.n_hosts > 0 else 0
    )
    ext = f"https://www.{next_host}/"
    links = "".join(
        f'<a href="{u}">l</a>'
        for u in ([*sections.keys(), *recent, *variant_links, *private_urls, ext])
    )
    add(
        f"{base}/",
        f"<html><head><title>{spec.host}</title></head><body>{links}</body></html>",
        offset_s=10,
    )

    feed = _feed_xml(base, recent)
    rows.append(
        {
            "url": f"{base}/feed",
            "warc_ts": REFERENCE_TS - dt.timedelta(seconds=5),
            "html": feed.encode("utf-8"),
            "text": "",
            "lang": "en",
        }
    )
    return rows


# article indices per generation task: bounds both the Arrow batch size
# (40 KB-weighted pages × 2000 ≈ 80 MB, far under Arrow's 2 GB array cap)
# and the straggler length for Zipf-hot hosts
GEN_CHUNK = 2000


def generate_web_spark(spark, seed: int = 42, n_hosts: int = 200, target_pages: int = 60000):
    """Distributed generation: (host, article-range) spec DF → mapInPandas.

    This is the scale path: one row per ~GEN_CHUNK articles, so a Zipf-hot
    host with 10^5 pages generates across dozens of tasks instead of one
    straggler, and no single Arrow batch can exceed the 2 GB array limit.
    """
    from pyspark.sql import types as T

    specs = make_host_specs(seed, n_hosts, target_pages)
    chunk_rows = []
    for s in specs:
        for start in range(0, s.n_articles, GEN_CHUNK):
            chunk_rows.append(
                (s.host, s.host_idx, s.n_articles, start,
                 min(start + GEN_CHUNK, s.n_articles), s.bot_sensitivity,
                 s.crawl_delay, s.has_robots, s.frequency)
            )
    spec_df = spark.createDataFrame(
        chunk_rows,
        "host string, host_idx int, n_articles int, start_k int, end_k int, "
        "bot_sensitivity int, crawl_delay double, has_robots boolean, "
        "frequency string",
    ).repartition(max(spark.sparkContext.defaultParallelism * 2,
                      min(len(chunk_rows), 64)))

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    def gen(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                spec = HostSpec(
                    host=r.host,
                    host_idx=r.host_idx,
                    n_articles=r.n_articles,
                    bot_sensitivity=r.bot_sensitivity,
                    crawl_delay=r.crawl_delay,
                    has_robots=r.has_robots,
                    frequency=r.frequency,
                    n_hosts=n_hosts,
                )
                out = gen_host_pages_range(spec, seed, r.start_k, r.end_k)
                # one yield per spec row keeps every Arrow batch bounded
                if out:
                    yield pd.DataFrame(out, columns=cols)

    pages = spec_df.mapInPandas(gen, schema)
    seeds, robots = _seeds_robots(specs)
    return pages, spark.createDataFrame(seeds), spark.createDataFrame(robots)
