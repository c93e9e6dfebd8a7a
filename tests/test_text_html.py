"""Text-analysis column functions and the deterministic extraction cascade."""

from __future__ import annotations

import pyspark.sql.functions as F

from mizzounewscrawler_spark.functions import text as X
from mizzounewscrawler_spark.functions.html import (
    extract_feed_links,
    extract_links,
    extract_text,
    extract_title,
    is_challenge_page,
)


def test_extraction_cascade_stages():
    art = (
        "<html><head><title>T</title></head><body>"
        "<article><p>" + "long content here " * 20 + "</p></article>"
        "<p>sidebar junk</p></body></html>"
    )
    text, method = extract_text(art)
    assert method == "article_block"
    assert "sidebar junk" not in text
    noart = "<html><body>" + "<p>" + "para text " * 30 + "</p>" + "</body></html>"
    _, method2 = extract_text(noart)
    assert method2 == "all_paragraphs"
    short = "<html><body><div>tiny</div></body></html>"
    t3, method3 = extract_text(short)
    assert method3 == "tag_strip" and t3 == "tiny"


def test_entities_and_whitespace_normalized():
    h = "<html><body><article><p>a &amp; b\t\tc " + "x " * 100 + "</p></article></body></html>"
    text, _ = extract_text(h)
    assert "a & b c" in text
    assert "\t" not in text


def test_links_and_feeds():
    h = '<a href="/rel">r</a><a href="https://abs.test/x">a</a><a href="#frag">f</a>'
    links = extract_links(h, "https://base.test/dir/page.html")
    assert links == ["https://base.test/rel", "https://abs.test/x"]
    rss = "<?xml version='1.0'?><rss><channel><item><link>https://a.test/1</link></item><item><link>https://a.test/2</link></item></channel></rss>"
    assert extract_feed_links(rss) == ["https://a.test/1", "https://a.test/2"]


def test_challenge_detection():
    assert is_challenge_page("<title>Just a moment...</title>")
    assert not is_challenge_page("<title>Regular News Story</title>")
    assert extract_title("<title> Hello &amp; World </title>") == "Hello & World"


def test_token_and_quality_exprs(spark):
    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog of the farm",),
         ("",),
         ("!!! ??? ...",)],
        ["text"],
    )
    rows = df.select(
        X.token_count_expr(F.col("text")).alias("n"),
        X.stopword_ratio_expr(F.col("text")).alias("sw"),
        X.quality_score_expr(F.col("text")).alias("q"),
        X.lang_id_expr(F.col("text")).alias("lang"),
    ).collect()
    assert rows[0]["n"] == 11
    assert abs(rows[0]["sw"] - 5 / 11) < 1e-9  # the×3, and, of → 5/11
    assert rows[0]["lang"] == "en"
    assert rows[1]["n"] == 0 and rows[1]["q"] == 0.0
    assert rows[2]["lang"] == "und"


def test_lang_id_multilingual(spark):
    df = spark.createDataFrame(
        [("el alcalde de la ciudad dijo que el presupuesto es un problema",),
         ("le maire de la ville est dans le conseil pour une réunion",),
         ("der bürgermeister und die stadt ist ein gutes beispiel nicht wahr",)],
        ["text"],
    )
    langs = [r["l"] for r in df.select(X.lang_id_expr(F.col("text")).alias("l")).collect()]
    assert langs == ["es", "fr", "de"]


def test_simhash_and_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("hello world foo bar baz",)], ["text"])
    a = df.select(X.simhash_expr(F.col("text")).alias("s"),
                  X.fingerprint_expr(F.col("text")).alias("f")).collect()[0]
    b = df.select(X.simhash_expr(F.col("text")).alias("s"),
                  X.fingerprint_expr(F.col("text")).alias("f")).collect()[0]
    assert a["s"] == b["s"] and a["f"] == b["f"]
    assert a["s"] is not None and a["f"] is not None


# -- C7/U3: title suffix strip + per-field merge ------------------------------


def test_title_site_suffix_strip():
    from mizzounewscrawler_spark.functions.titles import strip_site_suffix

    cases = {
        # classic media-name suffix: long content part, one short suffix
        "Council approves the downtown budget | The Example Gazette":
            "Council approves the downtown budget",
        # two short parts: treated as suffixed, keep first
        "Big game tonight | Gazette": "Big game tonight",
        # short prefix, long content: prefix stripped
        "Opinion - County needs a better flood plan this year":
            "County needs a better flood plan this year",
        # multiple suffixes: trailing short parts stripped
        "Mayor outlines five-year infrastructure plan | News | Example Gazette":
            "Mayor outlines five-year infrastructure plan",
        # no separator: unchanged (modulo normalization)
        "A plain headline with no separator":
            "A plain headline with no separator",
        # separators INSIDE a long title with no short parts are kept
        "The long first clause of a headline - and the long second clause of it":
            "The long first clause of a headline",
    }
    for raw, want in cases.items():
        assert strip_site_suffix(raw) == want, raw
    assert strip_site_suffix(None) == ""
    assert strip_site_suffix("") == ""


def test_title_merge_order_and_methods():
    from mizzounewscrawler_spark.functions.titles import merge_title

    # meaningful structured-data title outranks the <title> tag
    t, m = merge_title("A sufficiently long structured headline", "Tag title | Site")
    assert t == "A sufficiently long structured headline" and m == "structured_data"
    # short sd title falls back to the tag (suffix-stripped)
    t, m = merge_title("Short", "A real tag headline of decent length | The Daily")
    assert t == "A real tag headline of decent length" and m == "title_tag"
    # tag empty: even a short sd title is used rather than nothing
    t, m = merge_title("Short", "")
    assert t == "Short" and m == "structured_data"
    t, m = merge_title("", ""); assert t == "" and m == "none"


def test_extraction_backfills_title_from_jsonld(spark):
    """U3: a page whose <title> is missing backfills from JSON-LD headline,
    and field_methods records the winning method per field."""
    from mizzounewscrawler_spark.operators.extraction import fetch_and_extract

    html = (
        '<html><head><script type="application/ld+json">'
        '{"headline": "The Structured Data Headline Wins Here",'
        ' "author": {"name": "Jane Q"}}</script></head>'
        "<body><article><p>Body text of the story goes here, long enough to"
        " clear the minimum extraction length gate for the article-block"
        " cascade stage, which requires one hundred and fifty characters of"
        " cleaned paragraph text before it accepts the block.</p></article>"
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://www.h.test/a", bytearray(html, "utf-8"))], ["url", "html"]
    )
    from mizzounewscrawler_spark.functions.urls import surt, url_hash
    s = surt("https://www.h.test/a")
    wave = spark.createDataFrame(
        [("https://www.h.test/a", s, url_hash(s), "h.test", 0)],
        "url string, url_surt string, url_hash long, host string, depth int",
    )
    row = fetch_and_extract(wave, pages).collect()[0]
    assert row["title"] == "The Structured Data Headline Wins Here"
    assert row["field_methods"]["title"] == "structured_data"
    assert row["author"] == "Jane Q"
    assert row["field_methods"]["author"] == "structured_data"
    assert row["field_methods"]["text"] == "article_block"


def test_extraction_strips_title_suffix(spark):
    """C7: ' | The Example Gazette' does not survive into extracted titles."""
    from mizzounewscrawler_spark.operators.extraction import fetch_and_extract

    html = (
        "<html><head><title>Mayor outlines the budget plan | The Example Gazette"
        "</title></head><body><article><p>Story body.</p></article></body></html>"
    )
    pages = spark.createDataFrame(
        [("https://www.h.test/b", bytearray(html, "utf-8"))], ["url", "html"]
    )
    from mizzounewscrawler_spark.functions.urls import surt, url_hash
    s = surt("https://www.h.test/b")
    wave = spark.createDataFrame(
        [("https://www.h.test/b", s, url_hash(s), "h.test", 0)],
        "url string, url_surt string, url_hash long, host string, depth int",
    )
    row = fetch_and_extract(wave, pages).collect()[0]
    assert row["title"] == "Mayor outlines the budget plan"
    assert row["field_methods"]["title"] == "title_tag"


def test_pii_redaction_scrubs_every_kind(spark):
    cases = [
        ("mail bob.smith+x@news.example.org now", "mail <EMAIL> now"),
        ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
        ("call +1 (573) 882-7070 today", "call <PHONE> today"),
        ("or 573.882.7070 or 573-882-7070", "or <PHONE> or <PHONE>"),
        ("host 10.0.254.3 down", "host <IP> down"),
        ("clean text stays clean", "clean text stays clean"),
        # order: SSN must win over the phone pattern, phone over IPv4
        ("id 987-65-4321 then 192.168.1.2", "id <SSN> then <IP>"),
    ]
    df = spark.createDataFrame(cases, "raw string, want string").select(
        "want", X.pii_redact_expr(F.col("raw")).alias("got")
    )
    for r in df.collect():
        assert r["got"] == r["want"]


def test_pii_counts_are_per_kind(spark):
    df = spark.createDataFrame(
        [("a@b.io c@d.io and 123-45-6789 at 8.8.8.8",)], "t string"
    ).select(
        X.pii_count_expr(F.col("t"), "email").alias("e"),
        X.pii_count_expr(F.col("t"), "ssn").alias("s"),
        X.pii_count_expr(F.col("t"), "phone").alias("p"),
        X.pii_count_expr(F.col("t"), "ipv4").alias("i"),
    )
    r = df.collect()[0]
    assert (r["e"], r["s"], r["p"], r["i"]) == (2, 1, 0, 1)


def test_compression_ratio_signal(spark):
    """zlib quality signal: exact parity with local zlib, NULL on empty,
    repetitive text scores far lower than high-entropy text."""
    import zlib

    from mizzounewscrawler_spark.functions.text import compression_ratio_col
    from pyspark.sql import functions as F

    import random

    rep = "spam " * 400
    rng = random.Random(42)
    noisy = "".join(chr(rng.randrange(33, 123)) for _ in range(2000))
    rows = [(1, rep), (2, noisy), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["ratio"]
        for r in df.select(
            "id", compression_ratio_col(F.col("text")).alias("ratio")
        ).collect()
    }

    def expect(s):
        b = s.encode()
        return round(len(zlib.compress(b, 6)) / len(b), 6)

    assert got[1] == expect(rep)
    assert got[2] == expect(noisy)
    assert got[3] is None and got[4] is None
    assert got[1] < 0.05 < 0.5 < got[2]


def test_syndication_signals_python_twin_matches_exprs(spark):
    """The extraction-time Python twin (functions.html.syndication_signals)
    and the column expressions (operators/content_type) must agree on
    every signal family — the crawl's sd_is_wire and the standalone
    cascade check the same markup."""
    import pyspark.sql.functions as F

    from mizzounewscrawler_spark.functions.html import syndication_signals
    from mizzounewscrawler_spark.operators.content_type import (
        canonical_syndication_expr,
        canonical_url_expr,
        distributor_wire_expr,
        syndication_signals_expr,
    )

    cases = [
        ("https://local.news/a",
         '<meta property="article:distributor_category" content="wires"/>'
         '<meta property="article:distributor_name" content="AP National"/>'),
        ("https://local.news/b",
         '<link rel="canonical" href="https://apnews.com/article/x">'),
        ("https://local.news/c",
         '<link rel="canonical" href="https://www.local.news/c">'),
        ("https://local.news/d",
         '<script type="application/ld+json">'
         '{"isBasedOn": "https://reuters.com/z"}</script>'),
        ("https://local.news/e",
         "<script>dataLayer.push({'tncms.syndication.source': 'UPI'});"
         "</script>"),
        ("https://local.news/f", "<html>plain</html>"),
    ]
    df = spark.createDataFrame(cases, "url string, html string")
    rows = df.select(
        "url",
        distributor_wire_expr(F.col("html"))["is_wire"].alias("d"),
        canonical_syndication_expr(
            F.col("url"), canonical_url_expr(F.col("html"))
        )["is_syndicated"].alias("c"),
        syndication_signals_expr(F.col("html"))["is_wire"].alias("j"),
    ).collect()
    expr_verdict = {
        r["url"]: bool(r["d"] or r["c"] or r["j"]) for r in rows
    }
    for url, html in cases:
        py_wire, _ = syndication_signals(html, url)
        assert py_wire == expr_verdict[url], url


def test_extract_structured_carries_syndication(spark):
    from mizzounewscrawler_spark.functions.html import extract_structured

    html = ('<html><meta property="article:distributor_category" '
            'content="wires"/><meta property="article:distributor_name" '
            'content="AP National"/><p>body</p></html>')
    sd = extract_structured(html, url="https://local.news/x")
    assert sd["is_wire"] and sd["provider"] == "AP National"
    # canonical cross-domain needs the page URL; without it, no flag
    chtml = '<link rel="canonical" href="https://apnews.com/a">'
    assert extract_structured(chtml)["is_wire"] is False
    assert extract_structured(chtml, url="https://local.news/y")["is_wire"]


class _FakeTrafilatura:
    """Stand-in with trafilatura's extract() signature for seam tests."""

    def __init__(self, result):
        self._result = result

    def extract(self, html_text):
        if isinstance(self._result, Exception):
            raise self._result
        return self._result


def test_trafilatura_seam_gating_and_fallback(monkeypatch):
    """U2 real-extractor stage (import-gated like the PIL codec):
    - lib absent + use_trafilatura=True -> NotImplementedError
    - lib present + long text -> method 'trafilatura'
    - lib present + short/None/crash -> falls through to the
      deterministic cascade byte-identically
    - default path ignores the lib entirely."""
    import pytest as _pytest

    from mizzounewscrawler_spark.functions import html as H

    body = "<p>" + "word " * 80 + "</p>"
    doc = f"<html><body><article>{body}</article></body></html>"
    det_text, det_method = H.extract_text(doc)
    assert det_method == "article_block"

    # absent lib: default off-path identical, on-path raises
    monkeypatch.setattr(H, "_trafilatura", None)
    assert H.extract_text_cascade(doc) == (det_text, det_method)
    assert not H.have_trafilatura()
    with _pytest.raises(NotImplementedError):
        H.extract_text_cascade(doc, use_trafilatura=True)

    # long real text wins as stage 0
    real = "Real extracted article text. " * 20
    monkeypatch.setattr(H, "_trafilatura", _FakeTrafilatura(real))
    assert H.extract_text_cascade(doc, use_trafilatura=True) == (
        real.strip(), "trafilatura"
    )
    # ... but the default path still never calls it
    assert H.extract_text_cascade(doc) == (det_text, det_method)

    # under the 200-char reference gate -> deterministic fallback
    monkeypatch.setattr(H, "_trafilatura", _FakeTrafilatura("too short"))
    assert H.extract_text_cascade(doc, use_trafilatura=True) == (
        det_text, det_method
    )
    # extractor returns None -> fallback
    monkeypatch.setattr(H, "_trafilatura", _FakeTrafilatura(None))
    assert H.extract_text_cascade(doc, use_trafilatura=True) == (
        det_text, det_method
    )
    # extractor crashes -> fallback (reference next-extractor-on-failure)
    monkeypatch.setattr(H, "_trafilatura", _FakeTrafilatura(ValueError("x")))
    assert H.extract_text_cascade(doc, use_trafilatura=True) == (
        det_text, det_method
    )


def test_trafilatura_parity_when_installed():
    """Where the REAL lib is importable (not this container), both paths
    agree on fixture HTML whose article block is unambiguous; documents
    the byte-compare contract the cluster deployment runs."""
    import pytest as _pytest

    from mizzounewscrawler_spark.functions import html as H

    if not H.have_trafilatura():
        _pytest.skip("trafilatura not installed in this container")
    body = "<p>" + "word " * 80 + "</p>"
    doc = f"<html><body><article>{body}</article></body></html>"
    real = H.extract_text_real(doc)
    det_text, _ = H.extract_text(doc)
    assert real is not None
    # whitespace-normalized equality: trafilatura may reflow paragraphs
    assert " ".join(real[0].split()) == " ".join(det_text.split())


def test_ws_collapse_and_urljoin_fastpath_equivalence():
    """The r5 extraction-kernel optimizations are output-identical:
    - the changed-only whitespace regex == the naive [ \\t\\r\\f\\v]+ sub
    - the absolute-href fast path == urljoin for non-dotted URLs."""
    import random
    import re
    from urllib.parse import urljoin

    from mizzounewscrawler_spark.functions.html import _RE_WS, extract_links

    naive = re.compile(r"[ \t\r\f\v]+")
    rng = random.Random(11)
    alphabet = "ab <>&amp; \t\r\f\v  xyz\n"
    for _ in range(5000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 80))
        )
        assert naive.sub(" ", s) == _RE_WS.sub(" ", s), repr(s)

    base = "https://www.example-3.test/2024/01/05/story.html"
    hrefs = [
        "http://a.test/x/y", "https://b.test/p?q=1", "/rel/x", "page.html",
        "HTTP://c.test/z", "http://a.test", "https://b.test/",
        "//proto.test/x", "http://a.test/x%20y", "https://b.test/a?b=c",
        "http://a.test/x/../y", "https://b.test/./z", "../up/one",
    ]
    doc = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    got = extract_links(doc, base)
    want = []
    seenset = set()
    for h in hrefs:
        u = urljoin(base, h.strip())
        if u not in seenset:
            seenset.add(u)
            want.append(u)
    assert got == want
