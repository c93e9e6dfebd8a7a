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
