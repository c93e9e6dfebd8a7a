"""Catalog entries for the U7 geo operators (operators/geo.py).

Fixture-backed like the MinHash/IVF entries: a deterministic
publishers/places/articles trio is written to the oracle fixture dir,
the Spark side runs the real operators, and the DuckDB mirror
re-implements the same semantics in SQL over the identical parquet.
The gazetteer used by the detection entry is itself persisted from the
(independently oracle-checked) Spark build, so both engines probe the
same index — the IVF candidate-set pattern.

Reference: /root/reference/src/pipeline/publisher_geo_filter.py (U7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mizzounewscrawler_spark.operators.geo import (
    NEAR_WIRE_INDICATORS,
    NON_LOCAL_TERMS,
    STAFF_TERMS,
    TEAM_KEYWORDS,
    WIRE_INDICATORS,
    build_publisher_gazetteer,
    classify_local_wire,
    detect_geographic_signals,
)

# deterministic dims — 8 publishers exercising every radius branch
# (metro daily / small-city daily / weekly / tri-weekly / bi-weekly /
# video / audio / digital) and every alias rule (saint-prefix,
# gainesville contractions, compact forms)
_PUBROWS = [
    # host, name, city, county, state, zip, media_type, frequency, lat, lon
    ("p0", "The Carthage Press", "Carthage", "Jasper", "MO", "64836", "print", "Weekly", 37.17, -94.31),
    ("p1", "Kansas City Daily Light", "Kansas City", "Jackson", "MO", "64101", "print", "Daily", 39.09, -94.58),
    ("p2", "Saint Charles Courier", "Saint Charles", "St. Charles", "MO", "63301", "digital_native", "", 38.78, -90.48),
    ("p3", "Gainesville Gazette", "Gainesville", "Ozark", "MO", "65655", "video_broadcast", "", 36.60, -92.42),
    ("p4", "Springfield Beacon", "Springfield", "Greene", "MO", "65801", "print", "Daily", 37.21, -93.29),
    ("p5", "Nixa Audio News", "Nixa", "Christian", "MO", "65714", "audio_broadcast", "", 37.05, -93.29),
    ("p6", "Bolivar Herald", "Bolivar", "Polk", "MO", "65613", "print", "Tri-Weekly", 37.61, -93.41),
    ("p7", "Saint Louis Ledger", "Saint Louis", "St. Louis", "MO", "63101", "print", "Bi-Weekly", 38.63, -90.20),
]
_PLACE_KINDS = [
    ("schools", "High School"),
    ("government", "Courthouse"),
    ("healthcare", "Hospital"),
    ("businesses", "Market"),
    ("landmarks", "Park"),
]


def _geo_fixtures() -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """(publishers, places, articles) — pure formulas, no RNG."""
    pubs = pd.DataFrame(
        _PUBROWS,
        columns=[
            "host", "name", "city", "county", "state", "zip",
            "media_type", "frequency", "lat", "lon",
        ],
    )
    places = []
    for _, p in pubs.iterrows():
        for j, (cat, label) in enumerate(_PLACE_KINDS):
            # 0.05° per step ≈ 3.45 mi: j=0..4 → 0..13.8 mi, so each
            # radius tier keeps a different prefix of the five places
            places.append(
                (f"{p['city']} {label}", cat, p["lat"] + 0.05 * j, p["lon"])
            )
        places.append(
            (f"{p['city']} Distant Mall", "businesses", p["lat"] + 2.0, p["lon"])
        )
    places_pd = pd.DataFrame(places, columns=["place", "category", "lat", "lon"])

    arts = []
    for i, p in pubs.iterrows():
        c, county, name = p["city"], p["county"], p["name"]
        rows = [
            # (text, title, authors, wire)
            (f"The {c} city council approved the budget. By Alice Johnson",
             f"{c} budget vote", "Alice Johnson", 0),
            ("WASHINGTON (AP) \u2014 Congress debated the measure today. "
             "Associated Press reports from the White House.",
             "Congress debates", None, 1),
            (f"Members of the {c} Fire Department hosted a drill in {c}.",
             None, None, 0),
            (f"The {county} county fair opens near {c} High School this "
             "weekend.", f"{county} county fair", "Staff Report", 0),
            ("A quiet story with no geography mentioned at all.",
             None, None, 0),
            (f"{c} Tigers win the season opener. By Bob Lee",
             f"{c} tigers triumph", None, 0),
            (f"Visitors from Chicago toured the {c} Courthouse on Monday.",
             None, None, 0),
            (f"Community notes from around the area, reported by {name}.",
             None, name, 0),
            (f"Shoppers in {c} returned to the {c} Market after repairs.",
             f"{c} market reopens", None, 0),
            ("REUTERS \u2014 Markets fell sharply as New York traders "
             "reacted to the report.", "Markets fall", None, 0),
            (f"The {c} Hospital and {c} Park host a joint fundraiser.",
             None, "Carol King, Dan Wu", 0),
            (f"{county} County officials met to discuss road repairs. "
             "By Alice Johnson", None, "Alice Johnson", 0),
        ]
        for t, (text, title, authors, wire) in enumerate(rows):
            arts.append((i * len(rows) + t, p["host"], text, title, authors, wire))
    arts_pd = pd.DataFrame(
        arts, columns=["article_id", "host", "text", "title", "authors", "wire"]
    )
    return pubs, places_pd, arts_pd


def _write_geo_fixtures(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    from mizzounewscrawler_spark.plans.relational import _write_fixture

    pubs_pd, places_pd, arts_pd = _geo_fixtures()
    _write_fixture(pubs_pd, "geo_publishers")
    _write_fixture(places_pd, "geo_places")
    _write_fixture(arts_pd, "geo_articles")
    return (
        spark.createDataFrame(pubs_pd),
        spark.createDataFrame(places_pd),
        spark.createDataFrame(arts_pd),
    )


def q_publisher_gazetteer(spark: SparkSession, sf: str) -> DataFrame:
    """U7 gazetteer build: coverage-radius tiers + own-name aliases +
    flat-earth radius join against the places dim."""
    pubs, places, _ = _write_geo_fixtures(spark)
    return build_publisher_gazetteer(pubs, places)


def q_geo_local_wire(spark: SparkSession, sf: str) -> DataFrame:
    """U7 signal detection + three-way local/wire classification over the
    deterministic article fixture."""
    from mizzounewscrawler_spark.plans.relational import _write_fixture

    pubs, places, arts = _write_geo_fixtures(spark)
    gaz = build_publisher_gazetteer(pubs, places)
    _write_fixture(gaz.toPandas(), "geo_gazetteer")
    out = classify_local_wire(
        detect_geographic_signals(arts, pubs, gaz), wire_col="wire"
    )
    return out.select(
        "article_id",
        F.array_join("detected_locations", "|").alias("detected"),
        "location_count",
        "has_geographic_signals",
        "signal_strength",
        "byline_signal",
        "team_signal",
        "county_signal",
        "wire_present",
        "local_probability",
        "coverage_radius",
        "classification",
        "local_wire",
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------


def _n(e: str) -> str:
    """normalize_name in DuckDB SQL (same steps as geo.normalize_name_expr)."""
    return (
        "lower(trim(regexp_replace(regexp_replace(translate("
        + e
        + ", '\u2019\u2018\u2013\u2014', '''''--'), '[^\\w\\s''-]', ' ', 'g'),"
        " '\\s+', ' ', 'g')))"
    )


def _compact(e: str) -> str:
    return "regexp_replace(" + e + ", '[^a-z0-9]', '', 'g')"


def _contains_any_sql(e: str, needles: tuple[str, ...]) -> str:
    return "(" + " OR ".join(
        f"contains({e}, '{w.replace(chr(39), chr(39) * 2)}')" for w in needles
    ) + ")"


_METRO_SQL = (
    "(contains(lower(city),'kansas city') OR contains(lower(city),'st. louis')"
    " OR contains(lower(city),'saint louis')"
    " OR contains(lower(city),'springfield'))"
)
_RADIUS_SQL = f"""CASE
  WHEN lower(media_type)='video_broadcast' THEN 45
  WHEN lower(media_type)='audio_broadcast' THEN 40
  WHEN lower(media_type)='digital_native' THEN 25
  WHEN contains(lower(frequency),'daily')
    THEN CASE WHEN {_METRO_SQL} THEN 30 ELSE 18 END
  WHEN contains(lower(frequency),'weekly') THEN 12
  ELSE 15 END"""

# shared gazetteer CTE body (reads the publishers/places fixtures)
_GAZ_CTE = """
pubsn AS (
  SELECT host, {city_n} AS city_n, {county_n} AS county_n,
         {radius} AS radius, lat, lon
  FROM pubs
),
own AS (
  SELECT host,
    unnest(list_distinct(list_filter([
      city_n, county_n,
      CASE WHEN county_n <> '' THEN county_n || ' county' END,
      CASE WHEN contains(city_n,'gainesville') THEN 'g''ville' END,
      CASE WHEN contains(city_n,'gainesville') THEN 'gville' END,
      CASE WHEN contains(city_n,'gainesville') THEN 'gainsville' END,
      CASE WHEN city_n LIKE 'saint %' THEN regexp_replace(city_n,'^saint ','st. ') END,
      CASE WHEN city_n LIKE 'saint %' THEN regexp_replace(city_n,'^saint ','st ') END,
      CASE WHEN city_n LIKE 'st. %' THEN regexp_replace(city_n,'^st\\. ','st ') END,
      CASE WHEN city_n LIKE 'st. %' THEN regexp_replace(city_n,'^st\\. ','saint ') END,
      {city_compact}
    ], x -> x IS NOT NULL AND x <> ''))) AS place,
    false AS is_institution
  FROM pubsn
),
near AS (
  SELECT n.host, {place_n} AS place, p.category = 'schools' AS is_institution
  FROM pubsn n JOIN places p
    ON sqrt((n.lat-p.lat)*(n.lat-p.lat) + (n.lon-p.lon)*(n.lon-p.lon)) * 69.0
       <= n.radius
  WHERE {place_n} <> ''
),
gazu AS (SELECT * FROM own UNION ALL SELECT * FROM near)
""".format(
    city_n=_n("city"),
    county_n=_n("county"),
    radius=_RADIUS_SQL,
    city_compact=_compact("city_n"),
    place_n=_n("p.place"),
)


def _sql_publisher_gazetteer(fix_dir: str) -> str:
    return f"""
WITH pubs AS (SELECT * FROM '{fix_dir}/geo_publishers.parquet'),
places AS (SELECT * FROM '{fix_dir}/geo_places.parquet'),
{_GAZ_CTE}
SELECT host, place, max(is_institution) AS is_institution
FROM gazu GROUP BY 1, 2
"""


_FIRE_RE = r"([A-Z][\w'`\-]+(?:\s+[A-Z][\w'`\-]+)*)\s+(?:Membership\s+)?Fire Department"
_MEMBERS_RE = r"Members of the ([A-Z][\w'`\-]+)"
_IN_RE = r"\bin\s+([A-Z][\w'`\-]+)\b"
_BYLINE_SQL_RE = r"\bBy[:\s]+([A-Z][a-zA-Z.''\- ]{1,80})"  # '' = escaped quote
_BLOCKED = (
    "january", "february", "march", "april", "may", "june", "july",
    "august", "september", "october", "november", "december",
    "class", "team", "season", "game", "round", "match", "tournament",
    "district", "division", "group", "state", "county",
)


def _sql_geo_local_wire(fix_dir: str) -> str:
    blocked = "[" + ", ".join(f"'{b}'" for b in _BLOCKED) + "]"
    team_any = " OR ".join(f"contains(d,'{k}')" for k in TEAM_KEYWORDS)
    # the heuristic patterns contain a literal apostrophe — double it for
    # the SQL string literal
    fire = _FIRE_RE.replace("'", "''")
    members = _MEMBERS_RE.replace("'", "''")
    in_re = _IN_RE.replace("'", "''")
    return f"""
WITH gaz AS (SELECT * FROM '{fix_dir}/geo_gazetteer.parquet'),
pubs AS (SELECT * FROM '{fix_dir}/geo_publishers.parquet'),
arts0 AS (SELECT * FROM '{fix_dir}/geo_articles.parquet'),
pubsn AS (
  SELECT host, {_n("city")} AS pub_city, {_n("county")} AS pub_county,
         lower(trim(name)) AS pub_name, {_RADIUS_SQL} AS radius
  FROM pubs
),
arts AS (
  SELECT article_id, host, coalesce(text,'') AS text, wire,
         trim(coalesce(authors,'')) AS authors_t,
         {_n("coalesce(text,'')")} AS text_norm,
         {_compact(_n("coalesce(text,'')"))} AS compact_text,
         substr({_n("coalesce(title, text, '')")}, 1, 100) AS title100
  FROM arts0
),
pairs AS (
  SELECT a.article_id, g.place, g.is_institution,
         regexp_matches(a.title100, '\\b' || g.place || '\\b') AS title_hit
  FROM arts a JOIN gaz g ON a.host = g.host
  WHERE regexp_matches(a.text_norm, '\\b' || g.place || '\\b')
     OR ({_compact("g.place")} <> ''
         AND contains(a.compact_text, {_compact("g.place")}))
),
ghits AS (
  SELECT article_id,
         list_sort(list(DISTINCT place)) AS gaz_locations,
         sum(CASE WHEN is_institution THEN 1 ELSE 0 END) AS inst_matches,
         sum(CASE WHEN title_hit THEN 1 ELSE 0 END) AS gaz_title
  FROM pairs GROUP BY 1
),
ap AS (
  SELECT host AS ap_host, lower(trim(p)) AS part, count(*) AS author_n
  FROM (
    SELECT host,
           unnest(regexp_split_to_array(authors_t,
                  '\\s*(?:,|;|/|(?i:\\band\\b))\\s*')) AS p
    FROM arts WHERE authors_t <> ''
  ) WHERE lower(trim(p)) <> '' GROUP BY 1, 2
),
aug AS (
  SELECT a.*, p.pub_city, p.pub_county, p.pub_name,
         coalesce(p.radius, 0) AS coverage_radius,
         coalesce(g.gaz_locations, CAST([] AS VARCHAR[])) AS gaz_locations,
         coalesce(g.inst_matches, 0) AS inst_matches,
         coalesce(g.gaz_title, 0) AS gaz_title,
         coalesce(ap.author_n, 0) AS author_n
  FROM arts a
  LEFT JOIN ghits g USING (article_id)
  LEFT JOIN pubsn p ON a.host = p.host
  LEFT JOIN ap ON a.host = ap.ap_host AND lower(a.authors_t) = ap.part
),
ex AS (
  SELECT *,
    list_filter(
      list_distinct(list_filter(
        list_transform([
          regexp_extract(text, '{fire}', 1),
          coalesce(regexp_split_to_array(
              regexp_extract(text, '{fire}', 1), '\\s+')[1], ''),
          regexp_extract(text, '{members}', 1),
          regexp_extract(text, '{in_re}', 1)
        ], x -> {_n("x")}),
        c -> c <> '' AND NOT list_contains({blocked}, c)
             AND length({_compact("c")}) > 2 AND length(c) > 2)),
      e -> NOT list_contains(gaz_locations, e)) AS extras
  FROM aug
),
sig AS (
  SELECT *,
    list_sort(list_concat(gaz_locations, extras)) AS detected,
    len(gaz_locations) + len(extras) AS n_loc,
    CASE WHEN n_loc = 0 THEN 0.0 WHEN n_loc = 1 THEN 0.4
         WHEN n_loc <= 3 THEN 0.7 ELSE 0.9 END AS s0,
    CASE WHEN n_loc = 1 AND len(gaz_locations) = 1
         THEN greatest(s0, 0.6) ELSE s0 END AS s1,
    (list_contains(detected, pub_city)
     OR len(list_filter(detected,
            d -> {_compact("d")} = {_compact("pub_city")})) > 0) AS city_in,
    CASE WHEN pub_city <> '' AND city_in
         THEN greatest(s1, 0.7) ELSE s1 END AS s2,
    (gaz_title > 0 OR len(list_filter(extras,
        e -> regexp_matches(title100, '\\b' || e || '\\b'))) > 0) AS title_any,
    CASE WHEN title_any AND n_loc > 0
         THEN least(s2 + 0.1, 1.0) ELSE s2 END AS strength,
    regexp_extract(text, '{_BYLINE_SQL_RE}', 0) AS byline_full,
    regexp_extract(text, '{_BYLINE_SQL_RE}', 1) AS byline_name,
    authors_t <> '' AS has_auth,
    CASE WHEN has_auth THEN 0.95 ELSE 0.0 END AS b0,
    CASE WHEN has_auth AND author_n > 1 THEN greatest(b0, 0.98) ELSE b0 END AS b1,
    CASE WHEN NOT has_auth AND byline_full <> ''
         THEN greatest(b1, 0.8) ELSE b1 END AS b2,
    CASE WHEN byline_full <> '' THEN strpos(text, byline_full) END AS by_pos,
    lower(substr(text, greatest(by_pos - 80, 1),
                 length(byline_full) + 160)) AS snip_by,
    CASE WHEN has_auth
         THEN strpos(lower(text), lower(authors_t)) END AS auth_pos,
    lower(substr(text, greatest(auth_pos - 80, 1),
                 length(authors_t) + 160)) AS snip_auth,
    (byline_full <> ''
     AND NOT {_contains_any_sql("snip_by", NEAR_WIRE_INDICATORS)}) AS clean_by,
    (byline_full = '' AND has_auth AND coalesce(auth_pos, 0) >= 1
     AND NOT {_contains_any_sql("snip_auth", NEAR_WIRE_INDICATORS)}) AS clean_auth,
    CASE WHEN clean_by OR clean_auth THEN greatest(b2, 0.9) ELSE b2 END AS b3,
    CASE WHEN pub_name <> '' AND contains(text_norm, pub_name)
         THEN greatest(b3, 0.9) ELSE b3 END AS b4,
    CASE WHEN has_auth THEN lower(authors_t)
         ELSE lower(trim(byline_name)) END AS cand,
    (cand <> '' AND {_contains_any_sql("cand", STAFF_TERMS)}) AS staffy,
    CASE WHEN staffy THEN greatest(b4, 0.98) ELSE b4 END AS b5,
    list_filter(regexp_split_to_array(pub_name, '\\W+')[1:2],
                s -> s <> '') AS pub_tok,
    (cand <> '' AND NOT staffy AND len(pub_tok) > 0
     AND len(list_filter(pub_tok, s -> NOT contains(cand, s))) = 0) AS fuzzy,
    CASE WHEN fuzzy THEN greatest(b5, 0.995) ELSE b5 END AS byline,
    {_contains_any_sql("text_norm", WIRE_INDICATORS)} AS wire_present,
    CASE WHEN n_loc = 0 THEN 0.0
         WHEN inst_matches > 0 THEN least(0.6, 0.25 * inst_matches)
         WHEN len(list_filter(detected, d -> ({team_any}))) > 0 THEN 0.25
         ELSE 0.0 END AS team,
    CASE WHEN pub_county <> ''
              AND (contains(text_norm, pub_county)
                   OR contains(text_norm, pub_county || ' county'))
         THEN 0.8 ELSE 0.0 END AS county_sig,
    greatest(least(
        strength*0.5 + byline*0.2 + team*0.1 + county_sig*0.2
        + CASE WHEN wire_present THEN -0.6 ELSE 0.0 END, 1.0), 0.0) AS lp
  FROM ex
)
SELECT article_id,
  coalesce(array_to_string(detected, '|'), '') AS detected,
  CAST(n_loc AS INT) AS location_count,
  n_loc > 0 AS has_geographic_signals,
  round(strength, 6) AS signal_strength,
  round(byline, 6) AS byline_signal,
  round(team, 6) AS team_signal,
  round(county_sig, 6) AS county_signal,
  wire_present,
  round(lp, 6) AS local_probability,
  CAST(coverage_radius AS INT) AS coverage_radius,
  CASE WHEN (wire <> 0 OR wire_present) THEN
    CASE WHEN (round(lp,6) >= 0.4 OR len(gaz_locations) > 0) THEN 'wire+local'
         WHEN ({_contains_any_sql("text_norm", NON_LOCAL_TERMS)}
               OR len(extras) > 0) THEN 'wire'
         ELSE 'wire+local' END
  ELSE
    CASE WHEN ({_contains_any_sql("text_norm", NON_LOCAL_TERMS)}
               OR len(extras) > 0)
              AND NOT (round(lp,6) >= 0.4 OR len(gaz_locations) > 0)
         THEN 'wire' ELSE 'local' END
  END AS classification,
  CASE WHEN classification IN ('local', 'wire+local') THEN 1 ELSE 0
  END AS local_wire
FROM sig
"""
