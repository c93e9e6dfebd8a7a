"""U7 geo filtering / publisher gazetteer build.

Reference: ``PublisherGeoFilter``
(/root/reference/src/pipeline/publisher_geo_filter.py:21-1396) builds a
per-publisher gazetteer by querying OSM Overpass for entities within a
media-type-dependent coverage radius of the publisher's location, then
detects geographic signals by matching article text against that gazetteer.

Spark-first restatement:
- the OSM Overpass HTTP dependency is the sanctioned external seam (like
  live fetch / LLM providers): here ``places`` is any DataFrame of
  ``(place, category, lat, lon)`` rows — a downloaded OSM extract at
  deployment, a deterministic fixture in tests;
- the radius join publisher×places is NOT a cross join: places and
  publisher coverage boxes are bucketed onto a lat/lon **grid** sized by
  the largest radius, publishers explode to the few cells their box
  overlaps, and the join is a plain equi hash join on the cell key
  followed by the exact haversine predicate — O(P·cells + N) shuffle on a
  uniform key instead of O(P×N) comparisons, the standard spatial-bucket
  pattern (works at continental place counts);
- geographic signal detection (reference ``detect_geographic_signals``) is
  a normalized-name join of article entities against the per-publisher
  gazetteer — same normalization as the builder.

The coverage radius table transcribes the reference's
``coverage_radius_by_type`` (publisher_geo_filter.py:33-43).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# miles, per media type (reference publisher_geo_filter.py:33-43; the
# 'daily' metro/small_city split keys off metro_area below)
COVERAGE_RADIUS_MILES: dict[str, float] = {
    "daily_metro": 30.0,
    "daily_small_city": 18.0,
    "weekly": 12.0,
    "bi-weekly": 12.0,
    "tri-weekly": 15.0,
    "video_broadcast": 45.0,
    "audio_broadcast": 40.0,
    "digital_native": 25.0,
    "print native": 15.0,
}
DEFAULT_RADIUS_MILES = 15.0
EARTH_RADIUS_MILES = 3958.8
MILES_PER_DEG_LAT = 69.0


def coverage_radius_expr(
    media_type: Column, metro: Column | None = None
) -> Column:
    """Coverage radius in miles for a publisher row (reference
    coverage_radius_by_type): dailies split metro/small-city, everything
    else is a flat per-type radius, unknown types get the print default."""
    is_metro = metro if metro is not None else F.lit(False)
    expr: Column = F.lit(DEFAULT_RADIUS_MILES)
    for mt, r in COVERAGE_RADIUS_MILES.items():
        if mt.startswith("daily"):
            continue
        expr = F.when(media_type == mt, F.lit(r)).otherwise(expr)
    return F.when(
        media_type == "daily",
        F.when(is_metro, F.lit(COVERAGE_RADIUS_MILES["daily_metro"])).otherwise(
            F.lit(COVERAGE_RADIUS_MILES["daily_small_city"])
        ),
    ).otherwise(expr)


def haversine_miles(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in miles — pure JVM column expressions."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) * F.sin(dphi) + F.cos(p1) * F.cos(p2) * F.sin(dlmb) * F.sin(
        dlmb
    )
    return 2 * EARTH_RADIUS_MILES * F.asin(F.sqrt(a))


def normalize_place_expr(name: Column) -> Column:
    """The reference's ``_normalize_name`` (publisher_geo_filter.py:81-95)
    as column expressions: unicode quotes/dashes → ascii, strip non-word
    punctuation, collapse whitespace, lowercase."""
    s = F.translate(name, "’‘–—", "''--")
    # (?U) = Java UNICODE_CHARACTER_CLASS so \w matches accented letters,
    # mirroring Python's unicode-default \w in the reference
    s = F.regexp_replace(s, r"(?U)[^\w\s'-]", " ")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.lower(F.trim(s))


def build_publisher_gazetteer(
    publishers: DataFrame,
    places: DataFrame,
    cell_deg: float | None = None,
) -> DataFrame:
    """Per-publisher gazetteer: every place within the publisher's coverage
    radius, via the grid-bucketed spatial join described in the module
    docstring.

    ``publishers``: (publisher, lat, lon, radius_miles) — dimension-sized.
    ``places``: (place, category, lat, lon) — can be huge (OSM extract).
    Returns (publisher, place, place_norm, category, lat, lon,
    distance_miles).

    ``cell_deg`` defaults to the largest publisher radius in degrees of
    latitude. Each publisher explodes to the FULL inclusive cell range of
    its bounding box (floor((p−r)/cell) … floor((p+r)/cell) per axis) — a
    box-cover that holds for any radius/cell ratio (longitude half-widths
    grow by 1/cos(lat) and can exceed the cell size at mid latitudes, so
    sampling a fixed −1/0/+1 neighborhood would skip interior cells). The
    haversine filter on the joined pairs is exact.
    """
    max_radius = (
        publishers.agg(F.max("radius_miles")).collect()[0][0] or DEFAULT_RADIUS_MILES
    )
    cell = cell_deg or max(max_radius / MILES_PER_DEG_LAT, 1e-6)

    def cell_idx(v: Column) -> Column:
        return F.floor(v / F.lit(cell)).cast("long")

    # longitude degrees per mile grow with latitude; pad the box by 1/cos(lat)
    pub = publishers.select(
        "publisher",
        F.col("lat").alias("_plat"),
        F.col("lon").alias("_plon"),
        "radius_miles",
        (F.col("radius_miles") / MILES_PER_DEG_LAT).alias("_rdeg_lat"),
        (
            F.col("radius_miles")
            / (MILES_PER_DEG_LAT * F.greatest(F.cos(F.radians("lat")), F.lit(0.1)))
        ).alias("_rdeg_lon"),
    )
    pub_cells = (
        pub.select(
            "*",
            F.explode(
                F.sequence(
                    cell_idx(F.col("_plat") - F.col("_rdeg_lat")),
                    cell_idx(F.col("_plat") + F.col("_rdeg_lat")),
                )
            ).alias("_ci"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(
                    cell_idx(F.col("_plon") - F.col("_rdeg_lon")),
                    cell_idx(F.col("_plon") + F.col("_rdeg_lon")),
                )
            ).alias("_cj"),
        )
        .withColumn("cell", F.concat_ws(":", F.col("_ci"), F.col("_cj")))
        .drop("_ci", "_cj")
    )

    pl = places.select(
        "place",
        normalize_place_expr(F.col("place")).alias("place_norm"),
        "category",
        "lat",
        "lon",
        F.concat_ws(
            ":", cell_idx(F.col("lat")), cell_idx(F.col("lon"))
        ).alias("cell"),
    )
    dist = haversine_miles(
        F.col("_plat"), F.col("_plon"), F.col("lat"), F.col("lon")
    )
    # filter on the exact distance (rounding first would flip boundary
    # rows relative to an exact-predicate mirror); round only for output
    return (
        pl.join(F.broadcast(pub_cells), "cell")
        .where(dist <= F.col("radius_miles"))
        .withColumn("distance_miles", F.round(dist, 3))
        .select(
            "publisher", "place", "place_norm", "category", "lat", "lon",
            "distance_miles",
        )
    )


def detect_geographic_signals(
    entities: DataFrame,
    gazetteer: DataFrame,
    entity_col: str = "entity_text",
    publisher_col: str = "publisher",
) -> DataFrame:
    """Reference ``detect_geographic_signals``: per (article, publisher),
    how many of the article's entities are places inside that publisher's
    coverage area — the geo-relevance filter for local-news scoping.

    One equi join on (publisher, normalized name) — the gazetteer is
    per-publisher-bounded (radius-limited), so the join key is selective;
    returns (article_id, publisher, n_local_mentions, local_places)."""
    ent = entities.select(
        "article_id",
        F.col(publisher_col).alias("publisher"),
        normalize_place_expr(F.col(entity_col)).alias("place_norm"),
    )
    gz = gazetteer.select("publisher", "place_norm", "place").dropDuplicates(
        ["publisher", "place_norm"]
    )
    return (
        ent.join(gz, ["publisher", "place_norm"])
        .groupBy("article_id", "publisher")
        .agg(
            F.count(F.lit(1)).alias("n_local_mentions"),
            F.array_sort(F.collect_set("place")).alias("local_places"),
        )
    )
