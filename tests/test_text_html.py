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
