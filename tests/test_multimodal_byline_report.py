"""Multimodal operators, byline cleaning, content-type cascade, county report."""

from __future__ import annotations

import pyspark.sql.functions as F

from mizzounewscrawler_spark.functions.byline import clean_byline_expr
from mizzounewscrawler_spark.operators.content_type import detect_content_type
from mizzounewscrawler_spark.operators.multimodal import (
    DecodeBackend,
    decode_metadata,
    extract_features,
    generate_fake_media,
    resize_images,
    sample_frames,
)
from mizzounewscrawler_spark.plans.report import county_report, entity_agg, latest_labels


# -- multimodal --------------------------------------------------------------


def test_decode_metadata(spark):
    media = generate_fake_media(spark, n=30)
    out = decode_metadata(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    assert all(r["ok"] for r in rows.values())
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video" and rows[2]["frames"] > 0


def test_features_deterministic(spark):
    media = generate_fake_media(spark, n=12)
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def test_frame_sampling_and_resize(spark):
    media = generate_fake_media(spark, n=30)
    frames = sample_frames(media, every_n=10).collect()
    assert frames and all(r["frame_idx"] % 10 == 0 for r in frames)
    vids = {r["media_id"] for r in frames}
    assert vids == {i for i in range(30) if i % 3 == 2}
    resized = resize_images(media, max_side=64).collect()
    assert resized and all(
        max(r["new_width"], r["new_height"]) <= 64 for r in resized
    )


def test_real_backend_is_explicit_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        DecodeBackend("real").decode(b"anything")


# -- byline ------------------------------------------------------------------


def test_clean_byline(spark):
    cases = [
        ("By John Smith and Jane Doe", ["John Smith", "Jane Doe"], False),
        ("john.smith@paper.com John Smith", ["John Smith"], False),
        ("Staff Writer", [], False),
        ("The Associated Press", [], True),
        ("By Maria Garcia, Reuters", ["Maria Garcia"], True),
        ("Bob Lee (City Desk) & Ann Wu", ["Bob Lee", "Ann Wu"], False),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["byline"])
    rows = df.select(clean_byline_expr(F.col("byline")).alias("b")).collect()
    for (raw, authors, wire), r in zip(cases, rows):
        assert list(r["b"]["authors"]) == authors, raw
        assert r["b"]["is_wire"] == wire, raw


def test_wire_service_mapped(spark):
    df = spark.createDataFrame([("The Associated Press",), ("Reuters",)], ["byline"])
    rows = df.select(clean_byline_expr(F.col("byline")).alias("b")).collect()
    assert rows[0]["b"]["wire_service"] == "AP"
    assert rows[1]["b"]["wire_service"] == "Reuters"


# -- content type ------------------------------------------------------------


def test_content_type_cascade_order(spark):
    rows = [
        # url pattern wins over everything (stage 1)
        ("https://x.test/opinion/piece", "Opinion: whatever", "Reuters", "passed away", "opinion"),
        # wire byline beats title/content (stage 2)
        ("https://x.test/news/a", "Opinion: hm", "The Associated Press", "text", "wire"),
        # title pattern (stage 3)
        ("https://x.test/news/b", "Editorial: our view", "Jane Doe", "text", "opinion"),
        # content pattern (stage 4)
        ("https://x.test/news/c", "Life story", "Jane Doe", "He is survived by family", "obituary"),
        # default
        ("https://x.test/news/d", "Council votes", "Jane Doe", "The council voted.", "news"),
        ("https://x.test/sports/game", "Big game", "J", "t", "sports"),
        ("https://x.test/obituaries/jane", "Jane", "J", "t", "obituary"),
    ]
    df = spark.createDataFrame(
        [(u, t, a, x) for u, t, a, x, _ in rows], ["url", "title", "author", "text"]
    )
    got = [r["content_type"] for r in detect_content_type(df).collect()]
    assert got == [r[4] for r in rows]
    conf = detect_content_type(df).select("content_confidence").collect()
    assert all(0.0 < r[0] <= 1.0 for r in conf)


def test_content_type_pattern_table_parity_and_priority(spark):
    """O5: the table-driven cascade (first match by (priority, id)) matches
    the static ladder on the fixture, and re-prioritizing the TABLE — no
    code change — re-orders the cascade."""
    from mizzounewscrawler_spark.operators.content_type import (
        PATTERN_TABLE_SCHEMA,
        default_pattern_table,
        detect_content_type_tabular,
    )

    rows = [
        ("https://x.test/opinion/piece", "Opinion: whatever", "Reuters", "passed away"),
        ("https://x.test/news/a", "Opinion: hm", "The Associated Press", "text"),
        ("https://x.test/news/b", "Editorial: our view", "Jane Doe", "text"),
        ("https://x.test/news/c", "Life story", "Jane Doe", "He is survived by family"),
        ("https://x.test/news/d", "Council votes", "Jane Doe", "The council voted."),
        ("https://x.test/sports/game", "Big game", "J", "t"),
        ("https://x.test/obituaries/jane", "Jane", "J", "t"),
    ]
    df = spark.createDataFrame(rows, ["url", "title", "author", "text"])
    static = [r["content_type"] for r in detect_content_type(df).collect()]
    tabular = [
        r["content_type"] for r in detect_content_type_tabular(df).collect()
    ]
    assert tabular == static
    # flip priorities: content patterns (band 40 → 1) now beat url patterns
    flipped = [
        (i, st, ct, pat, 1 if pr == 40 else pr, c, a)
        for (i, st, ct, pat, pr, c, a) in default_pattern_table(spark).collect()
    ]
    pats = spark.createDataFrame(flipped, PATTERN_TABLE_SCHEMA)
    got = [
        r["content_type"]
        for r in detect_content_type_tabular(df, patterns=pats).collect()
    ]
    # row 0: content "passed away" (obituary) now outranks /opinion/ url
    assert got[0] == "obituary" and static[0] == "opinion"
    # inactive rows are skipped entirely
    off = [
        (i, st, ct, pat, pr, c, False)
        for (i, st, ct, pat, pr, c, a) in default_pattern_table(spark).collect()
    ]
    none_active = spark.createDataFrame(off, PATTERN_TABLE_SCHEMA)
    got_off = detect_content_type_tabular(df, patterns=none_active).collect()
    assert {r["content_type"] for r in got_off} == {"news"}


# -- county report -----------------------------------------------------------


def test_county_report_joins_windows_agg(spark):
    articles = spark.createDataFrame(
        [
            ("https://a.test/1", 11, "a.test", "T1", "Jane", "extracted"),
            ("https://a.test/2", 12, "a.test", "T2", "Bob", "wire"),  # excluded
            ("https://b.test/1", 21, "b.test", "T3", "Ann", "extracted"),
        ],
        "url string, url_hash long, host string, title string, author string, status string",
    )
    sources = spark.createDataFrame(
        [("a.test", "A Gazette", "Columbia", "Boone"),
         ("b.test", "B Herald", "Rolla", "Phelps")],
        "host string, name string, city string, county string",
    )
    labels = spark.createDataFrame(
        [(11, "politics", 0.9, "2024-01-01"), (11, "sports", 0.8, "2024-02-01"),
         (21, "weather", 0.7, "2024-01-15")],
        "article_id long, primary_label string, confidence double, applied_at string",
    )
    entities = spark.createDataFrame(
        [(11, "Columbia", "GPE"), (11, "Mayor Smith", "PERSON"), (21, "Rolla", "GPE")],
        "article_id long, entity_text string, entity_label string",
    )
    ll = {r["article_id"]: r["primary_label"] for r in latest_labels(labels).collect()}
    assert ll == {11: "sports", 21: "weather"}  # latest applied_at wins
    ea = {r["article_id"]: r["entities"] for r in entity_agg(entities).collect()}
    assert ea[11] == "Columbia [GPE]; Mayor Smith [PERSON]"
    rep = county_report(articles, sources, labels, entities).collect()
    assert [r["url"] for r in rep] == ["https://a.test/1", "https://b.test/1"]
    assert rep[0]["primary_label"] == "sports"
    assert rep[0]["county"] == "Boone"
    boone = county_report(articles, sources, labels, entities, county="Boone").collect()
    assert len(boone) == 1


def test_callsign_exemption_in_pattern_table(spark):
    """Local-broadcaster callsign exemption (reference
    content_type_detector.py:30-56,995-1057): a '(CALLSIGN) —' dateline is
    wire only when the callsign is a KNOWN local broadcaster and the url is
    NOT its own site; own-site datelines and unknown callsigns stay news."""
    from mizzounewscrawler_spark.operators.content_type import (
        detect_content_type_tabular,
    )

    dateline = "COLUMBIA, Mo. (KMIZ) — County officials met Tuesday."
    rows = [
        # KMIZ dateline on KMIZ's own site (abc17news.com) → local, NOT wire
        ("https://abc17news.com/news/a", "Meeting", "Staff", dateline, "news"),
        # same dateline syndicated on a different site → wire
        ("https://other.news.test/news/b", "Meeting", "Staff", dateline, "wire"),
        # unknown (out-of-market) callsign → never wire
        (
            "https://other.news.test/news/c", "Meeting", "Staff",
            "DENVER, Colo. (KUSA) — Something happened.", "news",
        ),
        # callsign matched via direct url substring (komu in komu.com)
        (
            "https://www.komu.com/news/d", "Meeting", "Staff",
            "COLUMBIA, Mo. (KOMU) — Local story.", "news",
        ),
    ]
    df = spark.createDataFrame(
        [(u, t, a, x) for u, t, a, x, _ in rows], ["url", "title", "author", "text"]
    )
    got = [r["content_type"] for r in detect_content_type_tabular(df).collect()]
    assert got == [r[4] for r in rows]
    # dataset scoping: an empty callsign dataset disables the stage entirely
    got_scoped = [
        r["content_type"]
        for r in detect_content_type_tabular(df, dataset="elsewhere").collect()
    ]
    assert got_scoped == ["news", "news", "news", "news"]


def test_wire_recheck_and_export_gating(spark, tmp_path):
    """wire_check_status second pass (reference models/__init__.py:159,
    extraction.py:103-121,328-334) + the BQ export gate (:1513-1516)."""
    from mizzounewscrawler_spark.operators.content_type import (
        initial_wire_check_status_expr,
        wire_recheck,
    )
    from mizzounewscrawler_spark.plans.export import run_bq_export

    rows = [
        # (url, title, author, text, status) — extracted row that is really
        # wire (AP byline, missed at first pass)
        ("https://a.test/news/1", "T1", "The Associated Press", "story", "extracted"),
        # wire-status row whose recheck finds NO wire signal → restored
        ("https://a.test/news/2", "T2", "Jane Doe", "plain local story", "wire"),
        # plain local row stays extracted
        ("https://a.test/news/3", "T3", "Jane Doe", "another story", "extracted"),
        # paywall rows never need the check
        ("https://a.test/news/4", "T4", "J", "x", "paywall"),
    ]
    df = spark.createDataFrame(
        rows, ["url", "title", "author", "text", "status"]
    ).withColumn(
        "wire_check_status", initial_wire_check_status_expr(F.col("status"))
    )
    init = {r["url"]: r["wire_check_status"] for r in df.collect()}
    assert init["https://a.test/news/4"] == "complete"  # paywall skips
    assert init["https://a.test/news/1"] == "pending"
    assert init["https://a.test/news/2"] == "pending"  # wire still verified

    # export BEFORE the recheck: pending rows are excluded
    arts = df.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "host", F.lit("a.test")
    ).withColumn("wave", F.lit(0)).withColumn(
        "publish_date", F.lit(None).cast("timestamp")
    ).withColumn("method", F.lit("m")).withColumn(
        "content_hash", F.sha2(F.col("text"), 256)
    )
    m1 = run_bq_export(spark, str(tmp_path / "e1"), arts)
    assert m1["articles"]["row_count"] == 1  # only the complete paywall row

    rechecked = wire_recheck(arts)
    by_url = {r["url"]: r for r in rechecked.collect()}
    assert all(r["wire_check_status"] == "complete" for r in by_url.values())
    assert by_url["https://a.test/news/1"]["status"] == "wire"  # caught
    assert by_url["https://a.test/news/2"]["status"] == "extracted"  # restored
    assert by_url["https://a.test/news/3"]["status"] == "extracted"

    m2 = run_bq_export(spark, str(tmp_path / "e2"), rechecked)
    assert m2["articles"]["row_count"] == 4


def test_real_codec_backend_gated_or_working():
    """The 'real' codec seam: decodes with PIL when installed, otherwise
    raises a clear NotImplementedError (sandbox has no image libs)."""
    import pytest

    from mizzounewscrawler_spark.operators.multimodal import DecodeBackend

    be = DecodeBackend(mode="real")
    try:
        import io

        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            be.decode(b"\x89PNG....")
        return
    buf = io.BytesIO()
    Image.new("RGB", (8, 5)).save(buf, format="PNG")
    out = be.decode(buf.getvalue())
    assert out["ok"] and (out["width"], out["height"]) == (8, 5)
    assert be.decode(b"not an image")["ok"] is False


def test_callsign_exemption_requires_host_ownership(spark):
    """Ownership = the url's HOST is a registered broadcaster domain; a
    third-party page that merely mentions the callsign (or a broadcaster
    domain) in its PATH is still syndicated → wire."""
    from mizzounewscrawler_spark.operators.content_type import (
        detect_content_type_tabular,
    )

    dateline = "COLUMBIA, Mo. (KOMU) — County officials met Tuesday."
    rows = [
        # callsign in the path of a third-party site → wire, not exempt
        ("https://example-paper.com/news/komu-report-on-flood", "wire"),
        # broadcaster domain quoted in the path of a third-party site → wire
        ("https://example-paper.com/about/komu.com-coverage", "wire"),
        # subdomain of the broadcaster's own domain → exempt (local)
        ("https://www.komu.com/news/a", "news"),
        # suffix-similar but different registered host → wire
        ("https://notkomu.com/news/b", "wire"),
    ]
    df = spark.createDataFrame(
        [(u, "Meeting", "Staff", dateline) for u, _ in rows],
        ["url", "title", "author", "text"],
    )
    got = [r["content_type"] for r in detect_content_type_tabular(df).collect()]
    assert got == [want for _, want in rows]


def test_bmp_codec_roundtrip_and_real_resize(spark):
    """The bmp backend is a REAL codec: encode→decode round-trips pixels,
    and resize_images re-encodes an actually-downscaled payload whose
    bytes decode to the new dimensions with nearest-neighbor pixels."""
    import numpy as np

    from mizzounewscrawler_spark.operators.multimodal import (
        DecodeBackend,
        _decode_bmp,
        decode_metadata,
        encode_bmp,
        resize_images,
    )

    # 4x2 image with distinct per-pixel BGR values
    w, h = 4, 2
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    payload = encode_bmp(w, h, px.tobytes())
    d = _decode_bmp(payload)
    assert d["ok"] and (d["width"], d["height"], d["kind"]) == (4, 2, "bmp")
    assert np.frombuffer(d["body"], dtype=np.uint8).reshape(h, w, 3).tolist() == px.tolist()

    big = np.zeros((300, 600, 3), dtype=np.uint8)
    big[:, :, 0] = (np.arange(600) % 256).astype(np.uint8)  # B ramps by x
    media = spark.createDataFrame(
        [(1, "image", encode_bmp(600, 300, big.tobytes()), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    be = DecodeBackend("bmp")
    meta = decode_metadata(media, be).collect()[0]
    assert (meta["ok"], meta["kind"], meta["width"], meta["height"]) == (
        True, "bmp", 600, 300,
    )
    out = resize_images(media, max_side=256, backend=be).collect()[0]
    assert (out["new_width"], out["new_height"]) == (256, 128)
    rd = _decode_bmp(bytes(out["payload"]))
    assert (rd["width"], rd["height"]) == (256, 128)
    small = np.frombuffer(rd["body"], dtype=np.uint8).reshape(128, 256, 3)
    # nearest-neighbor: output column x samples source column x*600//256
    xs = (np.arange(256) * 600 // 256) % 256
    assert small[0, :, 0].tolist() == xs.astype(np.uint8).tolist()


def test_bmp_decoder_rejects_garbage(spark):
    from mizzounewscrawler_spark.operators.multimodal import _decode_bmp

    assert _decode_bmp(None)["ok"] is False
    assert _decode_bmp(b"BM too short")["ok"] is False
    assert _decode_bmp(b"MMF1" + b"x" * 60)["ok"] is False


def test_canonical_cross_domain_syndication(spark):
    """Reference wire check #2: a <link rel=canonical> pointing at a
    different domain marks wire — known wire domains by name (exact and
    subdomain), unknown cross-domain canonicals by their domain; a
    same-domain canonical (www-insensitive) is NOT syndication."""
    from pyspark.sql import functions as F

    from mizzounewscrawler_spark.operators.content_type import (
        canonical_syndication_expr,
        canonical_url_expr,
    )

    rows = [
        (1, "https://local.news/a",
         '<link rel="canonical" href="https://apnews.com/article/x">'),
        (2, "https://local.news/b",
         '<link href="https://consumer.healthday.com/y" rel="canonical">'),
        (3, "https://local.news/c",
         '<link rel="canonical" href="https://www.local.news/c">'),
        (4, "https://local.news/d",
         '<link rel="canonical" href="https://sister-station.tv/d">'),
        (5, "https://local.news/e", "<html>no canonical</html>"),
    ]
    df = spark.createDataFrame(rows, "id int, url string, html string")
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id",
            canonical_syndication_expr(
                F.col("url"), canonical_url_expr(F.col("html"))
            ).alias("s"),
        ).collect()
    }
    assert out[1]["is_syndicated"] and out[1]["wire_name"] == "The Associated Press"
    assert out[2]["is_syndicated"] and out[2]["wire_name"] == "HealthDay"
    assert not out[3]["is_syndicated"]
    assert out[4]["is_syndicated"] and out[4]["wire_name"] == "sister-station.tv"
    assert not out[5]["is_syndicated"]

    # cascade integration: the syndication stage fires between byline and
    # title panels, and URL panels still win over it
    cas = spark.createDataFrame(
        [("https://local.news/a", "T", "Jane Doe", "body",
          "https://apnews.com/article/x"),
         ("https://local.news/opinion/z", "T", "Jane Doe", "body",
          "https://apnews.com/article/z")],
        "url string, title string, author string, text string, canon string",
    )
    got = [r["content_type"] for r in detect_content_type(
        cas, canonical_col="canon"
    ).collect()]
    assert got == ["wire", "opinion"]


def test_og_distributor_wire_detection(spark):
    """Reference wire check #1: article:distributor_category='wires' meta
    (either attribute order) marks wire with the distributor name; other
    categories and absent tags do not."""
    from pyspark.sql import functions as F

    from mizzounewscrawler_spark.operators.content_type import (
        detect_content_type,
        distributor_wire_expr,
    )

    rows = [
        (1, '<meta property="article:distributor_category" content="wires"/>'
            '<meta property="article:distributor_name" content="AP National"/>'),
        (2, '<meta content="syndicated" '
            'property="article:distributor_category"/>'),
        (3, '<meta property="article:distributor_category" '
            'content="original"/>'),
        (4, "<html>nothing</html>"),
    ]
    df = spark.createDataFrame(rows, "id int, html string")
    out = {r["id"]: r["s"] for r in df.select(
        "id", distributor_wire_expr(F.col("html")).alias("s")
    ).collect()}
    assert out[1]["is_wire"] and out[1]["wire_name"] == "AP National"
    assert out[2]["is_wire"] and out[2]["wire_name"] is None
    assert not out[3]["is_wire"] and not out[4]["is_wire"]

    cas = spark.createDataFrame(
        [("https://local.news/a", "T", "Jane Doe", "body", rows[0][1]),
         ("https://local.news/b", "T", "Jane Doe", "body", rows[3][1])],
        "url string, title string, author string, text string, html string",
    )
    got = [r["content_type"] for r in detect_content_type(
        cas, html_col="html"
    ).collect()]
    assert got == ["wire", "news"]


def test_cms_jsonld_syndication_signals(spark):
    """Reference wire checks #4: isBasedOn / mainEntityOfPage / Gannett
    contentSourceCode / TownNews dataLayer, first hit wins."""
    from pyspark.sql import functions as F

    from mizzounewscrawler_spark.operators.content_type import (
        syndication_signals_expr,
    )

    rows = [
        (1, '<script type="application/ld+json">'
            '{"isBasedOn": "https://apnews.com/article/abc"}</script>'),
        (2, '<script type="application/ld+json">{"mainEntityOfPage": '
            '{"@type": "WebPage", "@id": "https://www.cnn.com/x"}}</script>'),
        (3, '<script type="application/ld+json">{"metadata": '
            '"{\\"contentSourceCode\\":\\"USAT\\"}"}</script>'),
        (4, "<script>dataLayer.push({'tncms.syndication.source': "
            "'The Associated Press'});</script>"),
        (5, '<script>tncms.syndication.origin = '
            '"https://content.ap.org/story/9";</script>'),
        (6, '<script type="application/ld+json">'
            '{"isBasedOn": "https://local.news/orig"}</script>'),
        (7, "<html>plain page</html>"),
    ]
    df = spark.createDataFrame(rows, "id int, html string")
    out = {r["id"]: r["s"] for r in df.select(
        "id", syndication_signals_expr(F.col("html")).alias("s")
    ).collect()}
    assert out[1]["is_wire"] and out[1]["wire_name"] == "The Associated Press"
    assert out[1]["method"] == "jsonld_isBasedOn"
    assert out[2]["is_wire"] and out[2]["wire_name"] == "CNN"
    assert out[3]["is_wire"] and out[3]["wire_name"] == "USA Today"
    assert out[4]["is_wire"] and out[4]["wire_name"] == "The Associated Press"
    assert out[4]["method"] == "datalayer_syndication"
    assert out[5]["is_wire"] and out[5]["wire_name"] == "The Associated Press"
    # isBasedOn pointing at a non-wire domain is NOT a wire signal
    assert not out[6]["is_wire"]
    assert not out[7]["is_wire"]


def test_wire_cascade_order_matches_python_twin_on_both_signals(spark):
    """A page carrying BOTH a cross-domain canonical (reference check #2)
    and a JSON-LD isBasedOn (check #4) must resolve identically on the
    column cascade and the extraction-time Python twin: canonical wins
    (reference order #1 → #2 → #4), so the cascade stamps the canonical
    stage's confidence and the twin names the canonical domain."""
    from pyspark.sql import functions as F

    from mizzounewscrawler_spark.functions.html import syndication_signals
    from mizzounewscrawler_spark.operators.content_type import (
        canonical_url_expr,
    )

    html = (
        '<link rel="canonical" href="https://some-syndicator.example/x">'
        '<script type="application/ld+json">'
        '{"isBasedOn": "https://apnews.com/article/abc"}</script>'
    )
    url = "https://local.news/a"

    # twin: canonical checked before JSON-LD -> names the canonical domain
    is_wire, name = syndication_signals(html, url)
    assert is_wire and name == "some-syndicator.example"

    # column cascade: the canonical stage (0.88) fires, not the JSON-LD
    # stage (0.85)
    df = spark.createDataFrame(
        [(url, "T", "Jane Doe", "body", html)],
        "url string, title string, author string, text string, html string",
    )
    row = detect_content_type(
        df.withColumn("canon", canonical_url_expr(F.col("html"))),
        canonical_col="canon",
        html_col="html",
    ).collect()[0]
    assert row["content_type"] == "wire"
    assert abs(row["content_confidence"] - 0.88) < 1e-9
