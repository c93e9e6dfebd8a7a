"""U7 — publisher geo filtering / gazetteer build, Spark-first.

Reference semantics: ``/root/reference/src/pipeline/publisher_geo_filter.py``
(`PublisherGeoFilter`, 21-1396) — per-publisher coverage radius by media
type (27-43, 459-487), gazetteer build from the publisher's own
city/county plus aliases plus nearby entities within the coverage radius
(528-739), per-article geographic signal detection with a
location-count signal ladder, byline / team / county signals and a wire
penalty combined into ``local_probability`` (740-1096), and the
three-way local / wire / wire+local reclassification (1098-1360).

Seams (sanctioned non-goals, same as U5/U6): the reference fetches
nearby entities from the OSM Overpass API and publisher coordinates
from a zipcode REST service (339-527).  Both are **inputs** here — a
``places`` dim table ``(place, category, lat, lon)`` and ``lat``/``lon``
columns on the publishers dim — so everything below is deterministic
and network-free.

Spark shape (vs the reference's driver-side ``df.iterrows()`` loop):

* the gazetteer build is dim × dim — publishers join places on the
  reference's flat-earth distance (487-501: ``sqrt(dlat²+dlon²)·69`` mi)
  under each publisher's radius.  Both sides are broadcast-sized by
  construction (thousands of publishers × 10⁴-ish places), so the range
  predicate rides a broadcast nested-loop join and never shuffles the
  fact table.
* signal detection is one broadcast hash join articles ⋈ gazetteer on
  ``host`` followed by a JVM regexp per (article, place) pair and a
  single groupBy back to article grain — no per-row Python anywhere.
  Per-article cost is O(gazetteer-per-host) regex probes, the same
  work the reference does per row, but distributed and codegen'd.
* every later signal (byline, county, team, wire penalty, the
  classification) is a column expression at article grain.

At 100 TB the only shuffle is the pair→article groupBy, keyed by the
article id (uniform); the gazetteer stays a broadcast dim.

Two spatial-join paths coexist:

* :func:`radius_places_join` — the GRID-BUCKETED publisher×places radius
  join (cell equi-join + exact distance) for OSM-extract-scale places
  tables: places bucket onto a lat/lon grid sized by the largest radius,
  publishers explode to their bounding-box cells, and the join is a plain
  hash join on the cell key — O(P·cells + N), no cross join.
* :func:`build_publisher_gazetteer` — the full reference gazetteer
  (own city/county + aliases + nearby places) built ON TOP of the grid
  join with the reference's flat-earth metric.

:func:`entity_local_mentions` is the entity-grain variant (NER spans ⋈
gazetteer, J6-adjacent); :func:`detect_geographic_signals` is the
reference's text-grain detector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# constants (verbatim from the reference unless noted)
# ---------------------------------------------------------------------------

# coverage radius (miles) by media type — reference 32-43
METRO_CITIES = ("kansas city", "st. louis", "saint louis", "springfield")
RADIUS_DAILY_METRO = 30
RADIUS_DAILY_SMALL = 18
RADIUS_WEEKLY = 12
RADIUS_BIWEEKLY = 12
RADIUS_TRIWEEKLY = 15
RADIUS_VIDEO = 45
RADIUS_AUDIO = 40
RADIUS_DIGITAL = 25
RADIUS_DEFAULT = 15  # "print native"

# reference 1029-1043 (wire indicators that penalize local probability)
WIRE_INDICATORS = (
    " ap ", "(ap)", "associated press", "reuters", "bloomberg",
    "npr news", "cnn", "ap-wire", "tribune news service", "mcclatchy",
    "gannett", "usa today network",
)
# reference 985-993 (markers checked NEAR the byline)
NEAR_WIRE_INDICATORS = (
    "ap ", "associated press", "ap-wire", "reuters", "bloomberg",
    "npr news", "cnn",
)
STAFF_TERMS = ("staff", "staff report", "editor", "staff writer")
TEAM_KEYWORDS = (
    "lady", "cardinal", "tigers", "lions", "eagles", "bulldog",
    "panther", "diamond",
)
MONTHS = (
    "january", "february", "march", "april", "may", "june", "july",
    "august", "september", "october", "november", "december",
)
PLACE_BLACKLIST = (
    "class", "team", "season", "game", "round", "match", "tournament",
    "district", "division", "group", "state", "county",
)
# reference 1222-1244
NON_LOCAL_TERMS = (
    "washington", "new york", "los angeles", "chicago", "boston",
    "san francisco", "atlanta", "seattle", "international", "europe",
    "china", "russia", "united kingdom", "uk", "canada", "mexico",
    "congress", "white house", "president", "national",
)
LOCAL_PROB_THRESHOLD = 0.4  # reference 1248
BYLINE_RE = r"\bBy[:\s]+([A-Z][a-zA-Z.'\- ]{1,80})"


# ---------------------------------------------------------------------------
# scalar expressions
# ---------------------------------------------------------------------------


def normalize_name_expr(col: Column) -> Column:
    """Reference ``normalize_name`` / ``_normalize_name`` (81-95, 583-597):
    curly quotes → straight, en/em dashes → '-', non-[\\w\\s'-] → space,
    collapse whitespace, strip, lower.  (?U) = Java UNICODE_CHARACTER_CLASS
    so \\w matches accented letters like Python's unicode-default \\w;
    DuckDB oracle fixtures stay ASCII where mirrored (RE2 \\w is ASCII)."""
    s = F.translate(col, "’‘–—", "''--")
    s = F.regexp_replace(s, r"(?U)[^\w\s'-]", " ")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.lower(F.trim(s))


# legacy name used by the entity-grain path
normalize_place_expr = normalize_name_expr


def compact_expr(col: Column) -> Column:
    """Reference compact form (806-808): strip everything but [a-z0-9]."""
    return F.regexp_replace(col, "[^a-z0-9]", "")


def coverage_radius_profile_expr(
    media_type: Column, frequency: Column, city: Column
) -> Column:
    """Reference ``_calculate_coverage_radius`` (459-487), including its
    branch ORDER: the ``"weekly" in frequency`` test runs before the
    bi-/tri-weekly tests, so any frequency *containing* 'weekly'
    (bi-weekly, tri-weekly) resolves to the weekly radius — replicated
    deliberately."""
    mt = F.lower(media_type)
    fq = F.lower(frequency)
    ct = F.lower(city)
    is_metro = F.lit(False)
    for m in METRO_CITIES:
        is_metro = is_metro | ct.contains(m)
    return (
        F.when(mt == "video_broadcast", RADIUS_VIDEO)
        .when(mt == "audio_broadcast", RADIUS_AUDIO)
        .when(mt == "digital_native", RADIUS_DIGITAL)
        .when(
            fq.contains("daily"),
            F.when(is_metro, RADIUS_DAILY_METRO).otherwise(RADIUS_DAILY_SMALL),
        )
        .when(fq.contains("weekly"), RADIUS_WEEKLY)  # catches bi-/tri- too
        .otherwise(RADIUS_DEFAULT)
    )


def distance_miles_expr(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Reference ``_calculate_distance`` (489-501): flat-earth
    ``sqrt(dlat² + dlon²) × 69`` miles."""
    return F.sqrt(
        F.pow(lat1 - lat2, F.lit(2)) + F.pow(lon1 - lon2, F.lit(2))
    ) * F.lit(69.0)


# legacy per-type radius table (entity-grain path; the profile expr above
# derives the tier from raw publisher fields instead)
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
    """Coverage radius in miles for a pre-typed publisher row (reference
    coverage_radius_by_type, publisher_geo_filter.py:33-43): dailies split
    metro/small-city, everything else is a flat per-type radius, unknown
    types get the print default.  See
    :func:`coverage_radius_profile_expr` for the raw-fields variant."""
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


def radius_places_join(
    publishers: DataFrame,
    places: DataFrame,
    cell_deg: float | None = None,
    metric: str = "haversine",
) -> DataFrame:
    """Publisher×places radius join via the GRID-BUCKETED spatial join —
    every place within each publisher's coverage radius, scaling to
    OSM-extract-sized places tables (no cross join).

    ``publishers``: (publisher, lat, lon, radius_miles) — dimension-sized.
    ``places``: (place, category, lat, lon) — can be huge.
    Returns (publisher, place, place_norm, category, lat, lon,
    distance_miles).

    ``cell_deg`` defaults to the largest publisher radius in degrees of
    latitude. Each publisher explodes to the FULL inclusive cell range of
    its bounding box (floor((p−r)/cell) … floor((p+r)/cell) per axis) — a
    box-cover that holds for any radius/cell ratio (longitude half-widths
    grow by 1/cos(lat) and can exceed the cell size at mid latitudes, so
    sampling a fixed −1/0/+1 neighborhood would skip interior cells). The
    distance filter on the joined pairs is exact: ``metric="haversine"``
    (great-circle) or ``metric="flat"`` (the reference's
    ``sqrt(dlat²+dlon²)·69``, whose bounding box the same cover contains).
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
    dist_fn = haversine_miles if metric == "haversine" else distance_miles_expr
    dist = dist_fn(
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


def _city_aliases_array(city_norm: Column) -> Column:
    """Reference ``city_aliases`` (604-628) over a NORMALIZED city name.

    The reference also adds a curly-apostrophe variant, but then
    re-normalizes every gazetteer entry before returning (692-700),
    which maps it straight back — so it never survives and is omitted.
    """
    saint = city_norm.startswith("saint ")
    st_dot = city_norm.startswith("st. ")
    return F.array_distinct(
        F.filter(
            F.array(
                city_norm,
                F.when(city_norm.contains("gainesville"), F.lit("g'ville")),
                F.when(city_norm.contains("gainesville"), F.lit("gville")),
                F.when(city_norm.contains("gainesville"), F.lit("gainsville")),
                F.when(saint, F.regexp_replace(city_norm, "^saint ", "st. ")),
                F.when(saint, F.regexp_replace(city_norm, "^saint ", "st ")),
                F.when(st_dot, F.regexp_replace(city_norm, r"^st\. ", "st ")),
                F.when(st_dot, F.regexp_replace(city_norm, r"^st\. ", "saint ")),
                compact_expr(city_norm),
            ),
            lambda a: a.isNotNull() & (a != ""),
        )
    )


# ---------------------------------------------------------------------------
# gazetteer build
# ---------------------------------------------------------------------------


def build_publisher_gazetteer(
    publishers: DataFrame, places: DataFrame
) -> DataFrame:
    """Per-publisher gazetteer — reference ``build_publisher_gazetteer``
    (528-739) with the OSM fetch replaced by the ``places`` input dim.

    publishers: (host, name, city, county, state, zip, media_type,
    frequency, lat, lon).  places: (place, category, lat, lon) where
    category ∈ {schools, government, healthcare, businesses, landmarks}.
    Returns (host, place, is_institution) — normalized, distinct;
    'schools' entries are institutions (reference 684-690), everything
    else a geographic entity.

    Plan: own-name entries are a per-publisher array explode; nearby
    entities are publishers ⋈ places under the flat-earth radius
    predicate — a broadcast nested-loop join between two dims, never
    touching fact data.
    """
    pub = publishers.select(
        "host",
        normalize_name_expr(F.col("city")).alias("_city"),
        normalize_name_expr(F.col("county")).alias("_county"),
        coverage_radius_profile_expr(
            F.col("media_type"), F.col("frequency"), F.col("city")
        ).alias("coverage_radius"),
        F.col("lat").alias("_plat"),
        F.col("lon").alias("_plon"),
    )
    own = pub.select(
        "host",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.concat(
                        F.array(
                            F.col("_city"),
                            F.col("_county"),
                            F.when(
                                F.col("_county") != "",
                                F.concat(F.col("_county"), F.lit(" county")),
                            ),
                        ),
                        _city_aliases_array(F.col("_city")),
                    ),
                    lambda a: a.isNotNull() & (a != ""),
                )
            )
        ).alias("place"),
        F.lit(False).alias("is_institution"),
    )
    # nearby entities via the grid-bucketed join (works at OSM-extract
    # scale) with the reference's flat-earth metric
    nearby = (
        radius_places_join(
            pub.select(
                F.col("host").alias("publisher"),
                F.col("_plat").alias("lat"),
                F.col("_plon").alias("lon"),
                F.col("coverage_radius").cast("double").alias("radius_miles"),
            ),
            places,
            metric="flat",
        )
        .select(
            F.col("publisher").alias("host"),
            F.col("place_norm").alias("place"),
            (F.col("category") == "schools").alias("is_institution"),
        )
        .where(F.col("place") != "")
    )
    # distinct on (host, place): an entry that is both a school and an
    # own-name keeps is_institution=True (max aggregates the flag)
    return (
        own.unionByName(nearby)
        .groupBy("host", "place")
        .agg(F.max("is_institution").alias("is_institution"))
    )


def publisher_radius(publishers: DataFrame) -> DataFrame:
    """(host, coverage_radius) helper — the dim the detection output
    carries through (reference 755-760)."""
    return publishers.select(
        "host",
        coverage_radius_profile_expr(
            F.col("media_type"), F.col("frequency"), F.col("city")
        ).alias("coverage_radius"),
    )


# ---------------------------------------------------------------------------
# geographic signal detection
# ---------------------------------------------------------------------------


def _contains_any(col: Column, needles: tuple[str, ...]) -> Column:
    hit = F.lit(False)
    for n in needles:
        hit = hit | col.contains(n)
    return hit


def _pattern_places_array(text: Column) -> Column:
    """Reference ``extract_place_from_patterns`` (815-880): three
    capitalized-place heuristics over the ORIGINAL text, filtered
    against months / generic tokens / ≤2-char compacts, normalized."""
    fire = F.regexp_extract(
        text,
        r"([A-Z][\w'`\-]+(?:\s+[A-Z][\w'`\-]+)*)\s+(?:Membership\s+)?Fire Department",
        1,
    )
    members = F.regexp_extract(text, r"Members of the ([A-Z][\w'`\-]+)", 1)
    in_place = F.regexp_extract(text, r"\bin\s+([A-Z][\w'`\-]+)\b", 1)
    cand = F.array(
        fire,
        # first token of the fire-department name (reference 824-827)
        F.element_at(F.split(fire, r"\s+"), 1),
        members,
        in_place,
    )
    blocked = MONTHS + PLACE_BLACKLIST
    return F.array_distinct(
        F.filter(
            F.transform(cand, normalize_name_expr),
            lambda c: (c != "")
            & ~c.isin(*blocked)
            & (F.length(compact_expr(c)) > 2)
            # reference 885: pattern places shorter than 3 chars dropped
            & (F.length(c) > 2),
        )
    )


def detect_geographic_signals(
    articles: DataFrame,
    publishers: DataFrame,
    gazetteer: DataFrame,
    id_col: str = "article_id",
    text_col: str = "text",
    title_col: str | None = "title",
    authors_col: str | None = "authors",
) -> DataFrame:
    """Per-article geographic signals — reference
    ``detect_geographic_signals`` (740-1096) as one broadcast join + one
    groupBy + column expressions.

    Output grain = input articles; columns: ``detected_locations``
    (sorted array), ``location_count``, ``has_geographic_signals``,
    ``signal_strength``, ``byline_signal``, ``team_signal``,
    ``county_signal``, ``wire_present``, ``local_probability``,
    ``coverage_radius``, ``gaz_locations`` (the gazetteer-confirmed
    subset, for the classifier's non-local-evidence test).
    """
    title = (
        F.coalesce(F.col(title_col), F.col(text_col))
        if title_col
        else F.col(text_col)
    )
    authors = (
        F.coalesce(F.col(authors_col), F.lit("")) if authors_col else F.lit("")
    )
    art = articles.withColumn(
        "_text_norm", normalize_name_expr(F.coalesce(F.col(text_col), F.lit("")))
    ).withColumns(
        {
            "_compact_text": compact_expr(F.col("_text_norm")),
            # reference 937-940: first 100 chars of the normalized title
            "_title100": F.substring(normalize_name_expr(title), 1, 100),
            "_authors": F.trim(authors),
        }
    )

    # ---- gazetteer matches: broadcast join + JVM regexp per pair -------
    # normalized entries contain only [\w\s'-], none of which is a regex
    # metacharacter, so the reference's re.escape is a no-op here
    pairs = art.select(id_col, "host", "_text_norm", "_compact_text", "_title100").join(
        F.broadcast(gazetteer), "host"
    )
    boundary = F.concat(F.lit(r"\b"), F.col("place"), F.lit(r"\b"))
    compact_loc = compact_expr(F.col("place"))
    hit = F.regexp_like(F.col("_text_norm"), boundary) | (
        (compact_loc != "") & F.col("_compact_text").contains(compact_loc)
    )
    gaz_hits = (
        pairs.where(hit)
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_set("place")).alias("gaz_locations"),
            F.max(F.col("is_institution")).alias("_any_inst_entry"),
            F.sum(
                F.when(F.col("is_institution"), 1).otherwise(0)
            ).alias("inst_matches"),
            F.sum(
                F.when(F.regexp_like(F.col("_title100"), boundary), 1).otherwise(0)
            ).alias("_gaz_title_matches"),
        )
    )

    # ---- per-host author occurrence counts (reference 1112-1146) -------
    # authors strings split on , ; / and; each part counted per host; an
    # article's count is the count of its FULL lowercased authors string
    # (so only single-author strings ever look up > 0, as in the reference)
    author_parts = (
        art.where(F.col("_authors") != "")
        .select(
            F.col("host").alias("_ap_host"),
            F.explode(
                F.split(F.col("_authors"), r"\s*(?:,|;|/|(?i:\band\b))\s*")
            ).alias("_part"),
        )
        .select("_ap_host", F.lower(F.trim(F.col("_part"))).alias("_part"))
        .where(F.col("_part") != "")
        .groupBy("_ap_host", "_part")
        .agg(F.count(F.lit(1)).alias("_author_n"))
    )

    pubdim = publishers.select(
        "host",
        normalize_name_expr(F.col("city")).alias("_pub_city"),
        normalize_name_expr(F.col("county")).alias("_pub_county"),
        F.lower(F.trim(F.col("name"))).alias("_pub_name"),
        coverage_radius_profile_expr(
            F.col("media_type"), F.col("frequency"), F.col("city")
        ).alias("coverage_radius"),
    )

    out = (
        art.join(gaz_hits, id_col, "left")
        .join(F.broadcast(pubdim), "host", "left")
        .join(
            author_parts,
            (F.col("host") == F.col("_ap_host"))
            & (F.lower(F.col("_authors")) == F.col("_part")),
            "left",
        )
        .drop("_ap_host", "_part")
    )

    gaz_locs = F.coalesce(F.col("gaz_locations"), F.array().cast("array<string>"))
    extras = F.array_except(
        _pattern_places_array(F.coalesce(F.col(text_col), F.lit(""))), gaz_locs
    )
    detected = F.array_sort(F.concat(gaz_locs, extras))
    n_loc = F.size(detected)

    # signal-strength ladder (reference 892-899)
    strength = (
        F.when(n_loc == 0, 0.0)
        .when(n_loc == 1, 0.4)
        .when(n_loc <= 3, 0.7)
        .otherwise(0.9)
    )
    # single-location gazetteer boost (reference 902-920): the sole
    # detected location fuzzy-matches the gazetteer — ours are exact
    # members when they came from the join, so membership suffices
    strength = F.when(
        (n_loc == 1) & (F.size(gaz_locs) == 1), F.greatest(strength, F.lit(0.6))
    ).otherwise(strength)
    # publisher-city boost (reference 923-934)
    city_in = F.array_contains(detected, F.col("_pub_city")) | F.exists(
        detected,
        lambda d: compact_expr(d) == compact_expr(F.col("_pub_city")),
    )
    strength = F.when(
        (F.col("_pub_city") != "") & city_in, F.greatest(strength, F.lit(0.7))
    ).otherwise(strength)
    # title boost (reference 936-944): any detected location in the first
    # 100 normalized title chars (+0.1, capped at 1.0)
    title_hit = (F.coalesce(F.col("_gaz_title_matches"), F.lit(0)) > 0) | F.exists(
        extras,
        lambda e: F.regexp_like(
            F.col("_title100"), F.concat(F.lit(r"\b"), e, F.lit(r"\b"))
        ),
    )
    strength = F.when(
        title_hit & (n_loc > 0), F.least(strength + 0.1, F.lit(1.0))
    ).otherwise(strength)

    # ---- byline signal (reference 946-1026) -----------------------------
    text_orig = F.coalesce(F.col(text_col), F.lit(""))
    byline_full = F.regexp_extract(text_orig, BYLINE_RE, 0)
    byline_name = F.regexp_extract(text_orig, BYLINE_RE, 1)
    has_authors = F.col("_authors") != ""
    byline = F.when(has_authors, 0.95).otherwise(0.0)
    byline = F.when(
        has_authors & (F.coalesce(F.col("_author_n"), F.lit(0)) > 1),
        F.greatest(byline, F.lit(0.98)),
    ).otherwise(byline)
    byline = F.when(
        ~has_authors & (byline_full != ""), F.greatest(byline, F.lit(0.8))
    ).otherwise(byline)
    # near-byline wire check: ±80-char snippet around the byline (or the
    # explicit authors mention) free of wire markers → ≥ 0.9
    by_pos = F.when(byline_full != "", F.instr(text_orig, byline_full))
    snippet_by = F.lower(
        F.substring(
            text_orig,
            F.greatest(by_pos - 80, F.lit(1)),
            F.length(byline_full) + 160,
        )
    )
    auth_pos = F.when(
        has_authors, F.instr(F.lower(text_orig), F.lower(F.col("_authors")))
    )
    snippet_auth = F.lower(
        F.substring(
            text_orig,
            F.greatest(auth_pos - 80, F.lit(1)),
            F.length(F.col("_authors")) + 160,
        )
    )
    clean_by = (byline_full != "") & ~_contains_any(snippet_by, NEAR_WIRE_INDICATORS)
    clean_auth = (
        (byline_full == "")
        & has_authors
        & (F.coalesce(auth_pos, F.lit(0)) >= 1)
        & ~_contains_any(snippet_auth, NEAR_WIRE_INDICATORS)
    )
    byline = F.when(
        clean_by | clean_auth, F.greatest(byline, F.lit(0.9))
    ).otherwise(byline)
    # publisher name appears in the (normalized) text → ≥ 0.9
    byline = F.when(
        (F.col("_pub_name") != "")
        & F.col("_text_norm").contains(F.col("_pub_name")),
        F.greatest(byline, F.lit(0.9)),
    ).otherwise(byline)
    # staff/editor bylines → ≥ 0.98; fuzzy publisher-name byline → ≥ 0.995
    cand_byline = F.when(has_authors, F.lower(F.col("_authors"))).otherwise(
        F.lower(F.trim(byline_name))
    )
    byline = F.when(
        (cand_byline != "") & _contains_any(cand_byline, STAFF_TERMS),
        F.greatest(byline, F.lit(0.98)),
    ).otherwise(byline)
    pub_tok = F.filter(
        F.slice(F.split(F.col("_pub_name"), r"\W+"), 1, 2),
        lambda s: s != "",
    )
    fuzzy_pub = (
        (cand_byline != "")
        & ~_contains_any(cand_byline, STAFF_TERMS)
        & (F.size(pub_tok) > 0)
        & F.forall(pub_tok, lambda s: cand_byline.contains(s))
    )
    byline = F.when(fuzzy_pub, F.greatest(byline, F.lit(0.995))).otherwise(byline)

    # ---- team / county / wire (reference 1029-1087) ---------------------
    wire_present = _contains_any(F.col("_text_norm"), WIRE_INDICATORS)
    inst_m = F.coalesce(F.col("inst_matches"), F.lit(0))
    team = (
        F.when(n_loc == 0, 0.0)
        .when(inst_m > 0, F.least(F.lit(0.6), 0.25 * inst_m))
        .when(
            F.exists(
                detected, lambda d: _contains_any(d, TEAM_KEYWORDS)
            ),
            0.25,
        )
        .otherwise(0.0)
    )
    county = F.when(
        (F.col("_pub_county") != "")
        & (
            F.col("_text_norm").contains(F.col("_pub_county"))
            | F.col("_text_norm").contains(
                F.concat(F.col("_pub_county"), F.lit(" county"))
            )
        ),
        0.8,
    ).otherwise(0.0)

    local_prob = (
        strength * 0.5 + byline * 0.2 + team * 0.1 + county * 0.2
        + F.when(wire_present, -0.6).otherwise(0.0)
    )
    local_prob = F.greatest(F.least(local_prob, F.lit(1.0)), F.lit(0.0))

    keep = [c for c in articles.columns]
    return out.select(
        *keep,
        detected.alias("detected_locations"),
        gaz_locs.alias("gaz_locations"),
        n_loc.alias("location_count"),
        (n_loc > 0).alias("has_geographic_signals"),
        F.round(strength, 6).alias("signal_strength"),
        F.round(byline, 6).alias("byline_signal"),
        F.round(team, 6).alias("team_signal"),
        F.round(county, 6).alias("county_signal"),
        wire_present.alias("wire_present"),
        F.round(local_prob, 6).alias("local_probability"),
        F.coalesce(F.col("coverage_radius"), F.lit(0)).alias("coverage_radius"),
    )


# ---------------------------------------------------------------------------
# local/wire three-way classification
# ---------------------------------------------------------------------------


def classify_local_wire(
    signals: DataFrame,
    text_col: str = "text",
    wire_col: str | None = "wire",
) -> DataFrame:
    """Reference ``enhance_local_wire_classification`` (1098-1360): add
    ``classification`` ∈ {local, wire, wire+local} and ``local_wire``.

    ``signals`` is the output of :func:`detect_geographic_signals`.  The
    reference tests detected locations against its per-publisher
    ``local_geography`` tables; here the gazetteer IS the local-place
    set, so gazetteer-confirmed hits are local and pattern-extracted
    extras are the non-local evidence (input seam, documented).
    """
    text_norm = normalize_name_expr(F.coalesce(F.col(text_col), F.lit("")))
    wire_flag = (
        (F.coalesce(F.col(wire_col).cast("int"), F.lit(0)) != 0)
        if wire_col
        else F.lit(False)
    )
    wire_indicated = wire_flag | F.col("wire_present")
    non_local = _contains_any(text_norm, NON_LOCAL_TERMS) | (
        F.size(F.array_except(F.col("detected_locations"), F.col("gaz_locations")))
        > 0
    )
    has_local_locations = F.size(F.col("gaz_locations")) > 0
    local_signal = (
        (F.col("local_probability") >= LOCAL_PROB_THRESHOLD) | has_local_locations
    )
    cls = F.when(
        wire_indicated,
        F.when(local_signal, "wire+local")
        .when(non_local, "wire")
        .otherwise("wire+local"),
    ).otherwise(
        F.when(non_local & ~local_signal, "wire").otherwise("local")
    )
    return signals.withColumns(
        {
            "classification": cls,
            "local_wire": F.when(
                cls.isin("local", "wire+local"), 1
            ).otherwise(0),
        }
    )


# ---------------------------------------------------------------------------
# entity-grain local-mention counting (NER spans ⋈ gazetteer)
# ---------------------------------------------------------------------------


def entity_local_mentions(
    entities: DataFrame,
    gazetteer: DataFrame,
    entity_col: str = "entity_text",
    publisher_col: str = "publisher",
) -> DataFrame:
    """Per (article, publisher), how many of the article's NER entities are
    places inside that publisher's coverage area — the geo-relevance filter
    for local-news scoping (reference detect_geographic_signals applied at
    entity grain; the text-grain twin is
    :func:`detect_geographic_signals`).

    One equi join on (publisher, normalized name) over a
    :func:`radius_places_join` frame — the gazetteer is
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
