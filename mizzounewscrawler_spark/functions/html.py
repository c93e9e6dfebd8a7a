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
_RE_WS = re.compile(r"[ \t\r\f\v]+")
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
    txt = _RE_TAG.sub("", fragment)
    txt = _html.unescape(txt)
    txt = _RE_WS.sub(" ", txt)
    return txt.strip()


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
        absu = urljoin(base_url, href.strip())
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


def is_challenge_page(html_text: str) -> bool:
    title = extract_title(html_text).lower()
    return any(m in title for m in CHALLENGE_MARKERS)


def extract_feed_links(xml_text: str) -> list[str]:
    """RSS/Atom item links in document order (reference feed discovery,
    /root/reference/src/crawler/discovery.py:3105-3489, re-specced as a
    deterministic parse of ``<link>`` elements inside ``<item>``/``<entry>``)."""
    out: list[str] = []
    for m in re.finditer(
        r"<(item|entry)\b.*?</\1>", xml_text, re.IGNORECASE | re.DOTALL
    ):
        block = m.group(0)
        lm = re.search(r"<link[^>]*>(.*?)</link>", block, re.IGNORECASE | re.DOTALL)
        if lm and lm.group(1).strip():
            out.append(lm.group(1).strip())
            continue
        lm = re.search(r"<link\b[^>]*?href\s*=\s*[\"']([^\"']+)[\"']", block, re.IGNORECASE)
        if lm:
            out.append(lm.group(1).strip())
    return out
