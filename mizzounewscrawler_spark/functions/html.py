"""Deterministic HTML extraction cascade (pure functions).

Re-expresses the reference extractor cascade semantics
(/root/reference/src/mcmetadata/content.py:60-98: ordered extractors, first
whose text exceeds 200 chars wins, result ``.strip()``ed) with a
deterministic, dependency-free implementation.  The heavy third-party
extractors (trafilatura, readability, goose3…) are not in this container;
SURVEY.md §7 risk 1 resolves this by defining the golden text as "what the
cascade yields for this html" and making the cascade itself deterministic:

  stage 1 — ``<article>`` block: join the text of its ``<p>`` elements
  stage 2 — all ``<p>`` elements in the document
  stage 3 — full tag-strip of ``<body>``

A stage wins iff its stripped text is longer than ``MIN_EXTRACT_CHARS`` (200,
the reference gate at content.py:23); otherwise fall through; stage 3 always
returns (possibly short → downstream paywall gate at <150 chars,
/root/reference/src/cli/commands/extraction.py:1518).

These pure functions are the SINGLE implementation used by
(a) the Arrow-vectorized extraction operator (operators/extraction.py),
(b) the sequential reference-faithful simulator, and
(c) golden-fixture generation — so "byte-identical extracted text per url"
is a real three-way invariant, not a tautology of one code path.
"""

from __future__ import annotations

import html as _html
import re

MIN_EXTRACT_CHARS = 200  # reference: mcmetadata/content.py:23
MIN_CONTENT_LENGTH = 150  # paywall gate, reference: extraction.py:1518

_RE_ARTICLE = re.compile(r"<article\b[^>]*>(.*?)</article>", re.IGNORECASE | re.DOTALL)
_RE_P = re.compile(r"<p\b[^>]*>(.*?)</p>", re.IGNORECASE | re.DOTALL)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_SCRIPT = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
# matches only what a substitution actually CHANGES: runs >=2, or a single
# non-space whitespace char — a single " " maps to " " and rewriting it is
# pure cost (same output as r"[ \t\r\f\v]+" -> " ", property-tested;
# ~40% of the extraction kernel was re.sub rebuild time)
_RE_WS = re.compile(r"[ \t\r\f\v]{2,}|[\t\r\f\v]")
_RE_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_RE_BODY = re.compile(r"<body\b[^>]*>(.*?)</body>", re.IGNORECASE | re.DOTALL)
_RE_HREF = re.compile(r"<a\b[^>]*?href\s*=\s*[\"']([^\"'#][^\"']*)[\"']", re.IGNORECASE)
_RE_META = re.compile(
    r"<meta\b[^>]*?name\s*=\s*[\"'](author|byline)[\"'][^>]*?content\s*=\s*[\"']([^\"']*)[\"']",
    re.IGNORECASE,
)

# challenge-page panel (reference: extraction.py:1273-1312)
CHALLENGE_MARKERS = (
    "just a moment",
    "access denied",
    "attention required",
    "are you a robot",
    "checking your browser",
)


def _clean_fragment(fragment: str) -> str:
    """Strip tags + entities + normalize whitespace inside one text block."""
    # "<" scan is a C memchr — most <p> bodies carry no nested tags, so
    # skipping the tag regex on them is free output-identical speed
    txt = _RE_TAG.sub("", fragment) if "<" in fragment else fragment
    txt = _html.unescape(txt)
    txt = _RE_WS.sub(" ", txt)
    return txt.strip()


# Import-gated REAL extractor stage (U2 parity seam, same pattern as the
# PIL codec in operators/multimodal.py): when trafilatura is installed on
# the executors — it is NOT in this container — the cascade can run it as
# stage 0, exactly the reference's first extractor
# (/root/reference/src/mcmetadata/content.py:60-98, ordered cascade with
# trafilatura first).  The deterministic cascade stays the DEFAULT and the
# fallback, so fixtures and oracles never depend on a third-party lib.
try:  # pragma: no cover - exercised only where trafilatura is installed
    import trafilatura as _trafilatura
except ImportError:
    _trafilatura = None


def have_trafilatura() -> bool:
    return _trafilatura is not None


def extract_text_real(html_text: str) -> tuple[str, str] | None:
    """Stage 0: real-trafilatura extraction; None = fall through to the
    deterministic cascade (lib missing, extraction failed, or text under
    the reference's 200-char gate — content.py:23)."""
    if _trafilatura is None:
        return None
    try:
        txt = _trafilatura.extract(html_text)
    except Exception:  # noqa: BLE001 — a parser crash must fall through
        return None
    txt = (txt or "").strip()
    if len(txt) > MIN_EXTRACT_CHARS:
        return txt, "trafilatura"
    return None


def extract_text_cascade(
    html_text: str, use_trafilatura: bool = False
) -> tuple[str, str]:
    """U2 cascade with the optional real-library first stage.

    ``use_trafilatura=True`` requires the lib on the executors (raises
    NotImplementedError otherwise — config explicitly asked for a backend
    that is absent, same contract as the multimodal ``real`` codec);
    extraction failures and under-gate texts still fall through to the
    deterministic stages, mirroring the reference cascade's
    next-extractor-on-failure behavior."""
    if use_trafilatura:
        if _trafilatura is None:
            raise NotImplementedError(
                "use_trafilatura=True but trafilatura is not importable on "
                "this executor; install it or use the deterministic cascade"
            )
        got = extract_text_real(html_text)
        if got is not None:
            return got
    return extract_text(html_text)


def extract_text(html_text: str) -> tuple[str, str]:
    """Return (text, method) per the deterministic cascade."""
    doc = _RE_SCRIPT.sub("", html_text)
    m = _RE_ARTICLE.search(doc)
    if m:
        paras = [_clean_fragment(p) for p in _RE_P.findall(m.group(1))]
        paras = [p for p in paras if p]
        text = "\n\n".join(paras).strip()
        if len(text) > MIN_EXTRACT_CHARS:
            return text, "article_block"
    paras = [_clean_fragment(p) for p in _RE_P.findall(doc)]
    paras = [p for p in paras if p]
    text = "\n\n".join(paras).strip()
    if len(text) > MIN_EXTRACT_CHARS:
        return text, "all_paragraphs"
    body = _RE_BODY.search(doc)
    raw = body.group(1) if body else doc
    lines = [_clean_fragment(ln) for ln in re.split(r"<br\s*/?>|\n", raw)]
    text = "\n".join(ln for ln in lines if ln).strip()
    return text, "tag_strip"


def extract_title(html_text: str) -> str:
    m = _RE_TITLE.search(html_text)
    return _clean_fragment(m.group(1)) if m else ""


def extract_author(html_text: str) -> str:
    m = _RE_META.search(html_text)
    return m.group(2).strip() if m else ""


def extract_links(html_text: str, base_url: str) -> list[str]:
    """Collect absolute hrefs (resolve relative against base); order =
    document order, de-duplicated preserving first occurrence."""
    from urllib.parse import urljoin

    seen: set[str] = set()
    out: list[str] = []
    for href in _RE_HREF.findall(html_text):
        h = href.strip()
        # already-absolute hrefs (the common case in real pages) resolve
        # to themselves; RFC 3986 dot-segment removal is the one transform
        # urljoin would still apply, so only dotted paths take the slow
        # path (equivalence property-tested against urljoin)
        if h.startswith(("http://", "https://")) and "/." not in h:
            absu = h
        else:
            absu = urljoin(base_url, h)
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


def is_challenge_page(html_text: str) -> bool:
    title = extract_title(html_text).lower()
    return any(m in title for m in CHALLENGE_MARKERS)


def extract_feed_entries(xml_text: str) -> list[tuple[str, str | None]]:
    """RSS/Atom (link, pubDate-string) entries in document order (reference
    feed discovery /root/reference/src/crawler/discovery.py:3105-3489 +
    entry-date coercion ``_coerce_feed_entry`` :135-158, re-specced as a
    deterministic parse of ``<link>``/``<pubDate>`` inside items)."""
    out: list[tuple[str, str | None]] = []
    for m in re.finditer(
        r"<(item|entry)\b.*?</\1>", xml_text, re.IGNORECASE | re.DOTALL
    ):
        block = m.group(0)
        dm = re.search(
            r"<(pubDate|published|updated)[^>]*>(.*?)</\1>",
            block,
            re.IGNORECASE | re.DOTALL,
        )
        pub = dm.group(2).strip() if dm else None
        lm = re.search(r"<link[^>]*>(.*?)</link>", block, re.IGNORECASE | re.DOTALL)
        if lm and lm.group(1).strip():
            out.append((lm.group(1).strip(), pub))
            continue
        lm = re.search(r"<link\b[^>]*?href\s*=\s*[\"']([^\"']+)[\"']", block, re.IGNORECASE)
        if lm:
            out.append((lm.group(1).strip(), pub))
    return out


def extract_feed_links(xml_text: str) -> list[str]:
    """Feed item links only (see :func:`extract_feed_entries`)."""
    return [u for u, _ in extract_feed_entries(xml_text)]


MAX_FEED_ENTRIES = 50  # O4 per-feed cap, reference discovery.py:3293


def fresh_feed_links(xml_text: str) -> list[str]:
    """Feed links surviving the O4 cap + F6 recency window: at most 50 raw
    entries considered (reference ``feed.entries[:50]``), then entries dated
    older than ``RECENCY_DAYS_BACK`` before the pinned clock are dropped at
    discovery time; undated entries pass (reference discovery.py:1951-1956)."""
    from mizzounewscrawler_spark.functions.dates import (
        guard_future,
        is_recent,
        parse_date,
    )

    out = []
    for url, pub in extract_feed_entries(xml_text)[:MAX_FEED_ENTRIES]:
        if is_recent(guard_future(parse_date(pub))):
            out.append(url)
    return out


# -- structured data (C11) + publish date (C9) --------------------------------

_RE_JSONLD = re.compile(
    r"<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    re.IGNORECASE | re.DOTALL,
)
_RE_META_PROP = re.compile(
    r"<meta\b[^>]*?property\s*=\s*[\"']([^\"']+)[\"'][^>]*?content\s*=\s*[\"']([^\"']*)[\"']",
    re.IGNORECASE,
)
# wire-service provider panel (reference wire_services table seeds /
# structured-data wire signals, src/mcmetadata/structured_data.py:106-487)
_RE_WIRE_PROVIDER = re.compile(
    r"(?i)\b(associated press|reuters|afp|agence france|cnn newsource|"
    r"tribune news service|states newsroom)\b"
)


def extract_structured(html_text: str, url: str = "") -> dict:
    """JSON-LD + og/meta structured data (reference
    /root/reference/src/mcmetadata/structured_data.py:106-487): returns
    {title, author, date (raw string), provider, is_wire} with JSON-LD
    taking precedence over og/meta tags.  Tolerant of malformed JSON (the
    reference swallows parse errors the same way).  ``url`` (the page's
    own URL) additionally enables the deeper syndication checks
    (:func:`syndication_signals` — distributor meta, cross-domain
    canonical, CMS dataLayer) feeding ``is_wire``."""
    import json as _json

    out = {"title": "", "author": "", "date": "", "provider": "", "is_wire": False}
    m = _RE_JSONLD.search(html_text)
    if m:
        try:
            data = _json.loads(m.group(1))
        except (ValueError, TypeError):
            data = None
        if isinstance(data, list):
            data = data[0] if data else None
        if isinstance(data, dict):
            out["title"] = str(data.get("headline") or "")
            author = data.get("author")
            if isinstance(author, list) and author:
                author = author[0]
            if isinstance(author, dict):
                author = author.get("name")
            out["author"] = str(author or "")
            out["date"] = str(data.get("datePublished") or "")
            prov = data.get("sourceOrganization") or data.get("provider")
            if isinstance(prov, dict):
                prov = prov.get("name")
            out["provider"] = str(prov or "")
    metas = dict()
    for prop, content in _RE_META_PROP.findall(html_text):
        metas.setdefault(prop.lower(), content)
    out["title"] = out["title"] or metas.get("og:title", "")
    out["author"] = out["author"] or metas.get("article:author", "")
    out["date"] = out["date"] or metas.get("article:published_time", "")
    out["is_wire"] = bool(
        _RE_WIRE_PROVIDER.search(out["provider"])
        or _RE_WIRE_PROVIDER.search(metas.get("article:provider", ""))
    )
    if not out["is_wire"]:
        # reference wire checks #1/#2/#4 (distributor meta, cross-domain
        # canonical, CMS/JSON-LD syndication fields)
        w, name = syndication_signals(html_text, url)
        if w:
            out["is_wire"] = True
            out["provider"] = out["provider"] or name
    return out


def extract_publish_date(html_text: str, structured: dict | None = None):
    """C9 publish-date guess with the pinned future-date guard: JSON-LD
    datePublished → og article:published_time → <time datetime=…>; parsed
    via the deterministic format list, guarded vs REFERENCE_TS+90d
    (reference /root/reference/src/mcmetadata/dates.py:11-32)."""
    from mizzounewscrawler_spark.functions.dates import guard_future, parse_date

    sd = structured if structured is not None else extract_structured(html_text)
    raw = sd.get("date") or ""
    if not raw:
        tm = re.search(
            r"<time\b[^>]*?datetime\s*=\s*[\"']([^\"']+)[\"']",
            html_text,
            re.IGNORECASE,
        )
        raw = tm.group(1) if tm else ""
    return guard_future(parse_date(raw))



# Reference wire checks #1/#2/#4 (crawler/__init__.py:183-215, 4230-4470) —
# Python twins of the column expressions in operators/content_type.py
# (distributor_wire_expr / canonical_syndication_expr /
# syndication_signals_expr), applied at extraction time so the crawl's
# sd_is_wire carries the same signals the standalone cascade checks.
_RE_DIST_CAT = re.compile(
    r'<meta\s+[^>]*property\s*=\s*["\']article:distributor_category["\']'
    r'[^>]*content\s*=\s*["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_RE_DIST_CAT_ALT = re.compile(
    r'<meta\s+[^>]*content\s*=\s*["\']([^"\']+)["\'][^>]*'
    r'property\s*=\s*["\']article:distributor_category["\']',
    re.IGNORECASE,
)
_RE_DIST_NAME = re.compile(
    r'<meta\s+[^>]*property\s*=\s*["\']article:distributor_name["\']'
    r'[^>]*content\s*=\s*["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_RE_DIST_NAME_ALT = re.compile(
    r'<meta\s+[^>]*content\s*=\s*["\']([^"\']+)["\'][^>]*'
    r'property\s*=\s*["\']article:distributor_name["\']',
    re.IGNORECASE,
)
_RE_CANON = re.compile(
    r'<link\s+[^>]*rel\s*=\s*["\']canonical["\'][^>]*href\s*=\s*["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_RE_CANON_ALT = re.compile(
    r'<link\s+[^>]*href\s*=\s*["\']([^"\']+)["\'][^>]*rel\s*=\s*["\']canonical["\']',
    re.IGNORECASE,
)
_RE_ISBASEDON = re.compile(r'"isBasedOn"\s*:\s*"([^"]+)"', re.IGNORECASE)
_RE_MAINENTITY = re.compile(
    r'"mainEntityOfPage"\s*:\s*\{[^}]*"@id"\s*:\s*"([^"]+)"', re.IGNORECASE
)
_RE_GANNETT = re.compile(
    r'\\?"contentSourceCode\\?"\s*:\s*\\?"(USAT)\\?"', re.IGNORECASE
)
_RE_TN_SRC = re.compile(
    r'["\']?(?:tncms\.syndication\.source|townnews\.content\.source)["\']?'
    r'\s*[=:]\s*["\']([^"\']+)["\']',
    re.IGNORECASE,
)
_RE_TN_ORIGIN = re.compile(
    r'["\']?tncms\.syndication\.origin["\']?\s*[=:]\s*["\']([^"\']+)["\']',
    re.IGNORECASE,
)


def _first(html_text: str, *res) -> str:
    for r in res:
        m = r.search(html_text)
        if m:
            return m.group(1).strip()
    return ""


def _wire_name_for(value: str) -> str:
    from mizzounewscrawler_spark.operators.content_type import (
        WIRE_SERVICE_DOMAINS,
    )

    lo = value.lower()
    for dom, wire in WIRE_SERVICE_DOMAINS.items():
        if dom in lo:
            return wire
    return ""


def _strip_www(netloc: str) -> str:
    return netloc[4:] if netloc.startswith("www.") else netloc


def syndication_signals(html_text: str, url: str = "") -> tuple[bool, str]:
    """(is_wire, wire_name) from the reference's wire checks #1/#2/#4 in
    its order: OG distributor meta → cross-domain canonical → JSON-LD
    isBasedOn / mainEntityOfPage / Gannett contentSourceCode → TownNews
    dataLayer.  ``url`` enables the canonical check (cross-DOMAIN is the
    signal).

    Each regex scan is gated on a cheap substring membership test (the
    reference's own `'application/ld+json' in html_text` idiom) — this
    sits in the extraction hot path, and the common page carries none of
    these markers."""
    if "article:distributor_category" in html_text:
        cat = _first(html_text, _RE_DIST_CAT, _RE_DIST_CAT_ALT).lower()
        if cat in ("wires", "wire", "syndicated", "syndication"):
            return True, _first(html_text, _RE_DIST_NAME, _RE_DIST_NAME_ALT)
    canon = (
        _first(html_text, _RE_CANON, _RE_CANON_ALT)
        if "canonical" in html_text
        else ""
    )
    if canon and url:
        m_c = re.match(r"^https?://([^/]+)", canon)
        m_a = re.match(r"^https?://([^/]+)", url)
        if m_c and m_a:
            cd = _strip_www(m_c.group(1).lower())
            ad = _strip_www(m_a.group(1).lower())
            if cd and ad and cd != ad:
                from mizzounewscrawler_spark.operators.content_type import (
                    WIRE_SERVICE_DOMAINS,
                )

                for dom, wire in WIRE_SERVICE_DOMAINS.items():
                    if cd == dom or cd.endswith("." + dom):
                        return True, wire
                return True, cd
    if "isBasedOn" in html_text:
        based = _first(html_text, _RE_ISBASEDON)
        if based:
            w = _wire_name_for(based)
            if w:
                return True, w
    if "mainEntityOfPage" in html_text:
        main_id = _first(html_text, _RE_MAINENTITY)
        if main_id:
            w = _wire_name_for(main_id)
            if w:
                return True, w
    if "contentSourceCode" in html_text and _RE_GANNETT.search(html_text):
        return True, "USA Today"
    if "tncms" in html_text or "townnews" in html_text:
        tn = _first(html_text, _RE_TN_SRC)
        if tn:
            return True, tn
        origin = _first(html_text, _RE_TN_ORIGIN)
        if origin:
            w = _wire_name_for(origin)
            if w:
                return True, w
    return False, ""
