"""Content-type detection cascade (reference ``ContentTypeDetector.detect``,
/root/reference/src/utils/content_type_detector.py, 1,573 LoC; wire staging
/root/reference/src/cli/commands/extraction.py:1344-1502 — SURVEY.md C16/C17).

The reference walks regex panels per row in Python; here the panels are a
single ordered ``when``-ladder of column expressions.  **Stage order is the
parity contract** (C17): url patterns → byline wire → title patterns →
content patterns → default, first hit wins, with a fixed confidence per
stage (the reference's per-pattern confidences, collapsed to stage level).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.byline import clean_byline_expr

URL_PANELS: list[tuple[str, str, float]] = [
    # (content_type, url regex, confidence) — reference url_path patterns
    ("opinion", r"(?i)/(opinion|editorial|letters|column(ist)?s?)/", 0.95),
    ("obituary", r"(?i)/(obituar(y|ies)|deaths?)/", 0.95),
    ("sports", r"(?i)/sports?/", 0.90),
    ("event", r"(?i)/(events?|calendar)/", 0.85),
]
TITLE_PANELS: list[tuple[str, str, float]] = [
    ("opinion", r"(?i)^(opinion|editorial|letter( to the editor)?)[:|\-]", 0.85),
    ("obituary", r"(?i)\bobituar(y|ies)\b", 0.85),
]
CONTENT_PANELS: list[tuple[str, str, float]] = [
    ("obituary", r"(?i)\b(passed away|survived by|funeral services?)\b", 0.75),
    ("event", r"(?i)\b(will be held|doors open at|tickets (are )?available)\b", 0.65),
]

# O5: the data-driven priority-table form of the cascade above.  The
# reference stores its patterns in a ``wire_services``/detector table and
# matches in ``ORDER BY priority, id`` — lower priority value wins first
# (src/crawler/__init__.py:4516, src/utils/content_type_detector.py:333).
# ``stage`` names the column the regex applies to.
PATTERN_TABLE_SCHEMA = (
    "id int, stage string, content_type string, pattern string, "
    "priority int, confidence double, active boolean"
)
DEFAULT_PATTERN_ROWS: list[tuple] = [
    # priority bands reproduce the static stage order: url(10) → byline
    # wire(20) → title(30) → content(40); within a band id breaks ties
    *[
        (i + 1, "url", label, pat, 10, c, True)
        for i, (label, pat, c) in enumerate(URL_PANELS)
    ],
    (
        10, "byline", "wire",
        r"(?i)^(by[: ])?\s*(the\s+)?(associated press|ap|reuters|afp|cnn newsource)\b",
        20, 0.90, True,
    ),
    *[
        (i + 11, "title", label, pat, 30, c, True)
        for i, (label, pat, c) in enumerate(TITLE_PANELS)
    ],
    *[
        (i + 21, "content", label, pat, 40, c, True)
        for i, (label, pat, c) in enumerate(CONTENT_PANELS)
    ],
]


def default_pattern_table(df_or_spark) -> DataFrame:
    """The static panels as a pattern-table DataFrame (the shipped seed of
    the reference's detector table)."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.createDataFrame(DEFAULT_PATTERN_ROWS, PATTERN_TABLE_SCHEMA)


def pattern_ladder_from_table(
    patterns: DataFrame, cols: dict[str, Column]
) -> tuple[Column, Column]:
    """Fold the active pattern rows, ordered by (priority, id), into a
    first-match (content_type, confidence) ``when``-ladder.

    The table is a dimension (tens-to-hundreds of rows); collecting it
    driver-side mirrors the reference's TTL pattern cache (F4's shape,
    verification.collapse_dynamic_filters) and keeps classification a pure
    whole-stage-codegen column expression — no join, no row explosion.

    ``cols`` maps stage name → the Column its regexes test against; rows
    whose stage has no mapped column are skipped.
    """
    rows = (
        patterns.where(F.col("active"))
        .select("stage", "content_type", "pattern", "priority", "id", "confidence")
        .orderBy("priority", "id")
        .collect()
    )
    ctype: Column | None = None
    conf: Column | None = None
    for r in rows:
        target = cols.get(r["stage"])
        if target is None:
            continue
        pred = target.rlike(r["pattern"])
        if ctype is None:
            ctype = F.when(pred, F.lit(r["content_type"]))
            conf = F.when(pred, F.lit(r["confidence"]))
        else:
            ctype = ctype.when(pred, F.lit(r["content_type"]))
            conf = conf.when(pred, F.lit(r["confidence"]))
    if ctype is None:
        return F.lit("news"), F.lit(0.5)
    return ctype.otherwise(F.lit("news")), conf.otherwise(F.lit(0.5))


def detect_content_type_tabular(
    df: DataFrame,
    patterns: DataFrame | None = None,
    url_col: str = "url",
    title_col: str = "title",
    author_col: str = "author",
    text_col: str = "text",
) -> DataFrame:
    """O5: table-driven first-match-by-(priority, id) content-type cascade.

    Same output columns as :func:`detect_content_type`; pass a custom
    ``patterns`` table to re-prioritize or extend without code changes."""
    pats = patterns if patterns is not None else default_pattern_table(df)
    byline = clean_byline_expr(F.col(author_col))
    cols = {
        "url": F.coalesce(F.col(url_col), F.lit("")),
        "byline": F.coalesce(F.col(author_col), F.lit("")),
        "title": F.coalesce(F.col(title_col), F.lit("")),
        "content": F.coalesce(F.col(text_col), F.lit("")),
    }
    ctype, conf = pattern_ladder_from_table(pats, cols)
    return (
        df.withColumn("byline", byline)
        .withColumn("content_type", ctype)
        .withColumn("content_confidence", conf)
    )


def detect_content_type(
    df: DataFrame,
    url_col: str = "url",
    title_col: str = "title",
    author_col: str = "author",
    text_col: str = "text",
) -> DataFrame:
    """Add (content_type, content_confidence, byline struct) columns."""
    byline = clean_byline_expr(F.col(author_col))
    url = F.coalesce(F.col(url_col), F.lit(""))
    title = F.coalesce(F.col(title_col), F.lit(""))
    text = F.coalesce(F.col(text_col), F.lit(""))

    ctype: Column = None
    conf: Column = None

    def stage(pred: Column, label: str, c: float):
        nonlocal ctype, conf
        if ctype is None:
            ctype = F.when(pred, F.lit(label))
            conf = F.when(pred, F.lit(c))
        else:
            ctype = ctype.when(pred, F.lit(label))
            conf = conf.when(pred, F.lit(c))

    # stage 1: URL patterns (cheapest, most reliable — reference order)
    for label, pat, c in URL_PANELS:
        stage(url.rlike(pat), label, c)
    # stage 2: wire byline (reference stage-2, extraction.py:1427)
    stage(byline["is_wire"], "wire", 0.90)
    # stage 3: title patterns
    for label, pat, c in TITLE_PANELS:
        stage(title.rlike(pat), label, c)
    # stage 4: content patterns (most expensive, last)
    for label, pat, c in CONTENT_PANELS:
        stage(text.rlike(pat), label, c)

    return df.withColumn("byline", byline).withColumn(
        "content_type", ctype.otherwise(F.lit("news"))
    ).withColumn("content_confidence", conf.otherwise(F.lit(0.5)))
