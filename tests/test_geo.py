"""U7 geo filtering / publisher gazetteer build
(reference src/pipeline/publisher_geo_filter.py:21-1396)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mizzounewscrawler_spark.operators.geo import (
    COVERAGE_RADIUS_MILES,
    build_publisher_gazetteer,
    coverage_radius_expr,
    detect_geographic_signals,
    haversine_miles,
    normalize_place_expr,
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
    gz = build_publisher_gazetteer(pubs_df, places_df)
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
        for r in build_publisher_gazetteer(pubs_df, places_df).collect()
    }
    assert got == _brute_force(pubs, places, radius)


def test_detect_geographic_signals(spark):
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
    gz = build_publisher_gazetteer(pubs_df, places_df)
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
           detect_geographic_signals(ents, gz).collect()}
    assert sig[1]["n_local_mentions"] == 1
    assert sig[1]["local_places"] == ["Rock Bridge High School"]
    assert sig[2]["n_local_mentions"] == 1
    assert 3 not in sig
