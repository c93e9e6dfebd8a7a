"""U7 geo filtering — unit + behavior tests.

Reference semantics: /root/reference/src/pipeline/publisher_geo_filter.py
(coverage radius 459-487, gazetteer build 528-739, signal detection
740-1096, classification 1098-1360).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mizzounewscrawler_spark.operators import geo

PUB_SCHEMA = (
    "host string, name string, city string, county string, state string, "
    "zip string, media_type string, frequency string, lat double, lon double"
)
PLACE_SCHEMA = "place string, category string, lat double, lon double"
ART_SCHEMA = (
    "article_id int, host string, text string, title string, "
    "authors string, wire int"
)


def _pubs(spark):
    return spark.createDataFrame(
        [
            ("h1", "The Carthage Press", "Carthage", "Jasper", "MO", "64836",
             "print", "Weekly", 37.17, -94.31),
            ("h2", "KC Daily", "Kansas City", "Jackson", "MO", "64101",
             "print", "Daily", 39.09, -94.58),
            ("h3", "Saint Charles Post", "saint charles", "st. charles",
             "MO", "63301", "digital_native", "", 38.78, -90.48),
            ("h4", "Gainesville Tribune", "gainesville", "ozark", "MO",
             "65655", "video_broadcast", "", 36.60, -92.42),
        ],
        PUB_SCHEMA,
    )


def _places(spark):
    return spark.createDataFrame(
        [
            ("Carthage High School", "schools", 37.16, -94.30),  # ~1 mi
            ("Jasper County Courthouse", "government", 37.18, -94.32),
            ("Far Away Mall", "businesses", 40.0, -90.0),  # hundreds of mi
            ("Mercy Hospital", "healthcare", 39.10, -94.60),  # near KC
            ("Edge Park", "landmarks", 37.17 + 0.18, -94.31),  # ~12.4 mi
        ],
        PLACE_SCHEMA,
    )


def test_coverage_radius_tiers(spark):
    rows = spark.createDataFrame(
        [
            ("video_broadcast", "", "x"),
            ("audio_broadcast", "", "x"),
            ("digital_native", "", "x"),
            ("print", "Daily", "Kansas City"),   # metro daily
            ("print", "Daily", "Rolla"),          # small-city daily
            ("print", "Weekly", "x"),
            ("print", "Bi-Weekly", "x"),          # contains 'weekly' → 12
            ("print", "Tri-Weekly", "x"),         # contains 'weekly' → 12
            ("print", "", "x"),                    # print-native default
        ],
        "media_type string, frequency string, city string",
    )
    got = [
        r["r"]
        for r in rows.select(
            geo.coverage_radius_profile_expr(
                F.col("media_type"), F.col("frequency"), F.col("city")
            ).alias("r")
        ).collect()
    ]
    # the reference's contains-ordering makes bi-/tri-weekly resolve to the
    # weekly radius (publisher_geo_filter.py:478-484) — replicated
    assert got == [45, 40, 25, 30, 18, 12, 12, 12, 15]


def test_gazetteer_own_names_aliases_and_radius(spark):
    gaz = geo.build_publisher_gazetteer(_pubs(spark), _places(spark))
    by_host = {
        h: {r["place"]: r["is_institution"] for r in rows}
        for h, rows in (
            (h, gaz.where(F.col("host") == h).collect())
            for h in ("h1", "h2", "h3", "h4")
        )
    }
    # own city/county + ' county' suffix + compact alias
    assert "carthage" in by_host["h1"] and "jasper county" in by_host["h1"]
    assert "kansascity" in by_host["h2"]
    # saint-prefix aliases (on the NORMALIZED name)
    assert {"saint charles", "st. charles", "st charles"} <= set(by_host["h3"])
    # gainesville contractions
    assert {"g'ville", "gville", "gainsville"} <= set(by_host["h4"])
    # radius filter: weekly=12 mi keeps the ~1 mi school, drops the
    # ~12.4 mi park and the far mall
    assert by_host["h1"]["carthage high school"] is True  # schools → inst
    assert "edge park" not in by_host["h1"]
    assert "far away mall" not in by_host["h1"]
    # KC daily-metro = 30 mi keeps Mercy Hospital (~1.6 mi)
    assert "mercy hospital" in by_host["h2"]
    assert by_host["h2"]["mercy hospital"] is False


def _detect(spark, arts_rows):
    pubs = _pubs(spark)
    gaz = geo.build_publisher_gazetteer(pubs, _places(spark))
    arts = spark.createDataFrame(arts_rows, ART_SCHEMA)
    sig = geo.detect_geographic_signals(arts, pubs, gaz)
    return {
        r["article_id"]: r
        for r in geo.classify_local_wire(sig).collect()
    }


def test_signal_ladder_boosts_and_probability(spark):
    out = _detect(
        spark,
        [
            # 4 locations + title hit + county → strength 1.0, county .8,
            # authors byline .95 (clean)
            (1, "h1", "The Carthage council met at the Jasper County "
             "Courthouse. By John Smith", "Carthage vote", "John Smith", 0),
            # single gazetteer location → 0.4 then boost 0.6; city boost 0.7
            (2, "h1", "All eyes on Carthage tonight.", None, None, 0),
            # nothing at all
            (3, "h1", "Nothing to see here.", None, None, 0),
        ],
    )
    r1 = out[1]
    assert r1["signal_strength"] == 1.0
    assert r1["county_signal"] == 0.8
    assert r1["byline_signal"] == 0.95
    assert r1["local_probability"] == pytest.approx(0.85)
    assert r1["classification"] == "local" and r1["local_wire"] == 1
    r2 = out[2]
    # city boost 0.7, then +0.1 title boost: with no title the reference
    # falls back to the text's first 100 chars, which mention the city
    assert r2["signal_strength"] == 0.8
    assert out[3]["location_count"] == 0
    assert out[3]["local_probability"] == 0.0


def test_wire_penalty_and_three_way_classification(spark):
    out = _detect(
        spark,
        [
            # wire markers + national terms, no local → 'wire'
            (1, "h1", "WASHINGTON (AP) — Congress acted. "
             "Associated Press.", None, None, 1),
            # wire marker BUT strong local signals → 'wire+local'
            (2, "h1", "Associated Press reports the Carthage council and "
             "Jasper County officials met in Carthage.", "Carthage meets",
             "Staff Report", 0),
            # clean local story → 'local'
            (3, "h1", "The Carthage fair begins. By Jane Doe", None, None, 0),
            # no signals either way → 'local' (reference default)
            (4, "h1", "A calm afternoon.", None, None, 0),
        ],
    )
    assert out[1]["wire_present"] and out[1]["classification"] == "wire"
    assert out[1]["local_wire"] == 0
    assert out[2]["classification"] == "wire+local"
    assert out[2]["local_wire"] == 1
    assert out[3]["classification"] == "local"
    assert out[4]["classification"] == "local"


def test_pattern_places_filtered(spark):
    out = _detect(
        spark,
        [
            # 'in January' (month) and 'in Group' (blacklist) must NOT count;
            # 'in Neosho' (unknown real place) counts as a non-gazetteer extra
            (1, "h1", "It happened in January during the meeting.",
             None, None, 0),
            (2, "h1", "They played in Group stages.", None, None, 0),
            (3, "h1", "The crash occurred in Neosho yesterday.",
             None, None, 0),
        ],
    )
    assert out[1]["location_count"] == 0
    assert out[2]["location_count"] == 0
    assert out[3]["detected_locations"] == ["neosho"]
    # a non-gazetteer place is non-local evidence (reference 1294-1299):
    # with no countering local signal the story classifies away from local
    assert out[3]["classification"] == "wire"


def test_byline_staff_and_fuzzy_publisher(spark):
    out = _detect(
        spark,
        [
            (1, "h1", "Roadwork update for the area.", None, "Staff Report", 0),
            # byline fuzzy-matches publisher name tokens ('the carthage')
            (2, "h1", "Community notes this week.", None,
             "The Carthage Press Newsroom", 0),
            # regex byline with a wire marker nearby: no clean-byline boost
            (3, "h1", "Story filed. By Alice Brown, Associated Press",
             None, None, 0),
        ],
    )
    assert out[1]["byline_signal"] == 0.98
    assert out[2]["byline_signal"] == 0.995
    assert out[3]["byline_signal"] == 0.8


def test_author_repeat_count_boost(spark):
    # the same single author on ≥2 articles of one host → 0.98
    rows = [
        (i, "h1", f"Story {i} about Carthage. More text.", None,
         "Alice Johnson", 0)
        for i in (1, 2)
    ] + [(3, "h1", "Another story about Carthage.", None, "Bob Solo", 0)]
    out = _detect(spark, rows)
    assert out[1]["byline_signal"] == 0.98
    assert out[2]["byline_signal"] == 0.98
    assert out[3]["byline_signal"] == 0.95


def test_detection_plan_has_no_cartesian(spark):
    pubs = _pubs(spark)
    gaz = geo.build_publisher_gazetteer(pubs, _places(spark))
    arts = spark.createDataFrame(
        [(1, "h1", "Carthage story. By A B", None, None, 0)], ART_SCHEMA
    )
    plan = (
        geo.detect_geographic_signals(arts, pubs, gaz)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the gazetteer probe rides a broadcast join, not a shuffle of articles
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# grid-bucketed radius join (entity-grain path) — r4 tests, merged
# ---------------------------------------------------------------------------

import math

from mizzounewscrawler_spark.operators.geo import (
    COVERAGE_RADIUS_MILES,
    coverage_radius_expr,
    entity_local_mentions,
    haversine_miles,
    normalize_place_expr,
    radius_places_join,
)


def _brute_force(pubs, places, radius):
    out = set()
    for pname, plat, plon in pubs:
        for qname, qlat, qlon in places:
            dphi = math.radians(qlat - plat) / 2
            dlmb = math.radians(qlon - plon) / 2
            a = math.sin(dphi) ** 2 + math.cos(math.radians(plat)) * math.cos(
                math.radians(qlat)
            ) * math.sin(dlmb) ** 2
            d = 2 * 3958.8 * math.asin(math.sqrt(a))
            if d <= radius:
                out.add((pname, qname))
    return out


def test_haversine_known_distance(spark):
    # Columbia MO (38.9517,-92.3341) to Jefferson City MO (38.5767,-92.1735)
    # ≈ 27 miles
    df = spark.range(1).select(
        haversine_miles(
            F.lit(38.9517), F.lit(-92.3341), F.lit(38.5767), F.lit(-92.1735)
        ).alias("d")
    )
    d = df.collect()[0]["d"]
    assert 26.0 < d < 28.5, d


def test_coverage_radius_table(spark):
    rows = [
        ("daily", True, COVERAGE_RADIUS_MILES["daily_metro"]),
        ("daily", False, COVERAGE_RADIUS_MILES["daily_small_city"]),
        ("weekly", False, COVERAGE_RADIUS_MILES["weekly"]),
        ("video_broadcast", False, COVERAGE_RADIUS_MILES["video_broadcast"]),
        ("mystery_type", False, 15.0),  # default
    ]
    df = spark.createDataFrame(
        [(mt, m) for mt, m, _ in rows], "media_type string, metro boolean"
    ).select(coverage_radius_expr(F.col("media_type"), F.col("metro")).alias("r"))
    assert [r["r"] for r in df.collect()] == [r[2] for r in rows]


def test_normalize_place_matches_reference_shape(spark):
    df = spark.createDataFrame(
        [("Rock  Bridge’s “High” School!",), ("Café — Main",)],
        ["s"],
    ).select(normalize_place_expr(F.col("s")).alias("n"))
    got = [r["n"] for r in df.collect()]
    assert got[0] == "rock bridge's high school"
    assert "café" in got[1] and "-" in got[1]


def test_grid_join_equals_brute_force(spark):
    """The grid-bucketed spatial join must return EXACTLY the brute-force
    radius join's pairs (box-cover never misses; haversine is exact)."""
    import random

    rng = random.Random(7)
    pubs = [(f"pub{i}", 38.0 + rng.random() * 3, -94.0 + rng.random() * 4)
            for i in range(12)]
    places = [(f"pl{i}", 38.0 + rng.random() * 3, -94.0 + rng.random() * 4)
              for i in range(400)]
    radius = 25.0
    pubs_df = spark.createDataFrame(
        [(n, la, lo, radius) for n, la, lo in pubs],
        "publisher string, lat double, lon double, radius_miles double",
    )
    places_df = spark.createDataFrame(
        [(n, "poi", la, lo) for n, la, lo in places],
        "place string, category string, lat double, lon double",
    )
    gz = radius_places_join(pubs_df, places_df)
    got = {(r["publisher"], r["place"]) for r in gz.collect()}
    assert got == _brute_force(pubs, places, radius)
    # distances carried and within radius
    assert gz.where(F.col("distance_miles") > radius).count() == 0


def test_grid_join_covers_wide_lon_boxes(spark):
    """Regression: at mid latitudes the lon half-width (r/cos(lat)) exceeds
    the cell size (r in lat degrees), so the publisher box spans 4+ lon
    cells — a fixed −1/0/+1 cell sampling skips interior cells and loses
    in-radius places. Dense lon lattice makes any skipped cell visible."""
    radius = 30.0
    plat, plon = 42.0, -93.0  # cos(42°)≈0.743 → rdeg_lon/cell ≈ 1.35
    pubs = [("p0", plat, plon)]
    cell = radius / 69.0
    # places every cell/4 along the lon axis out to ±2 boxes, same lat
    places = [
        (f"pl{i}", plat, plon + (i - 40) * cell / 4) for i in range(81)
    ]
    pubs_df = spark.createDataFrame(
        [(n, la, lo, radius) for n, la, lo in pubs],
        "publisher string, lat double, lon double, radius_miles double",
    )
    places_df = spark.createDataFrame(
        [(n, "poi", la, lo) for n, la, lo in places],
        "place string, category string, lat double, lon double",
    )
    got = {
        (r["publisher"], r["place"])
        for r in radius_places_join(pubs_df, places_df).collect()
    }
    assert got == _brute_force(pubs, places, radius)


def test_entity_local_mentions(spark):
    pubs_df = spark.createDataFrame(
        [("gazette", 38.95, -92.33, 20.0)],
        "publisher string, lat double, lon double, radius_miles double",
    )
    places_df = spark.createDataFrame(
        [
            ("Rock Bridge High School", "schools", 38.90, -92.34),
            ("Boone County Courthouse", "government", 38.95, -92.33),
            ("Gateway Arch", "landmarks", 38.62, -90.18),  # ~120 mi away
        ],
        "place string, category string, lat double, lon double",
    )
    gz = radius_places_join(pubs_df, places_df)
    ents = spark.createDataFrame(
        [
            (1, "gazette", "Rock Bridge High School"),
            (1, "gazette", "Gateway Arch"),  # outside coverage → no signal
            (2, "gazette", "Boone County Courthouse"),
            (3, "gazette", "Eiffel Tower"),  # not in gazetteer
        ],
        "article_id long, publisher string, entity_text string",
    )
    sig = {r["article_id"]: r for r in
           entity_local_mentions(ents, gz).collect()}
    assert sig[1]["n_local_mentions"] == 1
    assert sig[1]["local_places"] == ["Rock Bridge High School"]
    assert sig[2]["n_local_mentions"] == 1
    assert 3 not in sig
