"""Boilerplate/content cleaning (C14) + the cleaned-text paywall gate.

Reference behavior being re-expressed
(/root/reference/src/utils/content_cleaner_balanced.py — 2,006 LoC):
- stage 1 *pattern mining* (:155-277): per publisher domain, find text
  segments repeated across many of that domain's articles (nav headers,
  subscription pitches, share bars, copyright footers);
- stage 2 *application* (:1139-1351): remove the mined segments from each
  article's text with balanced-boundary checks;
- the paywall length gate runs on the CLEANED text
  (/root/reference/src/cli/commands/extraction.py:1518-1595) — a page whose
  only real content is a subscription pitch is a paywall even if chrome
  inflates its raw length.

Spark-first restatement: the reference mines per-domain in per-row Python;
here mining is one explode → distinct → groupBy plan (shuffles keyed on
(host, line) — uniform enough, and a hot host's lines spread across
reducers), and application is a broadcast join + higher-order array
expression — NO Python anywhere, whole-stage codegen end to end.

Scale note (100 TB): the patterns table is #hosts × ~dozens of lines — a
broadcastable dimension by construction (only lines crossing the support
threshold survive mining).  Mining is one pass over articles; application
is map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_LINE_LEN = 20     # ignore short/empty lines (separator noise)
MIN_DOCS = 3          # a line must appear in >= this many docs ...
MIN_FRAC = 0.5        # ... and in >= this fraction of the host's docs
MIN_CONTENT_LENGTH = 150  # paywall gate on cleaned text (extraction.py:1518)


def mine_boilerplate(
    articles: DataFrame,
    host_col: str = "host",
    id_col: str = "url_hash",
    text_col: str = "text",
    min_docs: int = MIN_DOCS,
    min_frac: float = MIN_FRAC,
) -> DataFrame:
    """Stage 1: per-host repeated-line patterns → (host, line) rows.

    A line is boilerplate for a host iff it appears in ≥ max(min_docs,
    ceil(min_frac × host_docs)) DISTINCT documents of that host.  Counting
    distinct (host, doc, line) first makes a line repeated WITHIN one
    article count once — repetition across documents is the signal.
    """
    base = articles.where(F.col(text_col).isNotNull())
    lines = (
        base.select(
            F.col(host_col).alias("host"),
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), "\n")).alias("line"),
        )
        .where(F.length(F.trim("line")) >= MIN_LINE_LEN)
        .dropDuplicates(["host", "doc", "line"])
    )
    per_host_docs = base.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(id_col).alias("_docs")
    )
    support = F.greatest(
        F.lit(min_docs), F.ceil(F.lit(min_frac) * F.col("_docs")).cast("int")
    )
    return (
        lines.groupBy("host", "line")
        .agg(F.count("*").alias("_n"))
        .join(per_host_docs, "host")
        .where(F.col("_n") >= support)
        .select("host", "line", F.col("_n").alias("doc_count"))
    )


def apply_cleaning(
    articles: DataFrame,
    patterns: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    status_col: str = "status",
) -> DataFrame:
    """Stage 2 + gate: strip each host's mined lines from its articles and
    re-derive status on the CLEANED text.

    Adds ``text_clean`` and rewrites ``status``: 'extracted' rows become
    'cleaned', unless the cleaned text collapses under the 150-char gate —
    then 'paywall' (the reference's cleaning-dry-run paywall demotion).
    Other statuses pass through untouched.
    """
    boiler = patterns.groupBy(F.col("host").alias("_b_host")).agg(
        F.collect_set("line").alias("_boiler")
    )
    joined = articles.join(
        F.broadcast(boiler),
        articles[host_col] == F.col("_b_host"),
        "left",
    ).drop("_b_host")
    cleaned_arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
        lambda x: ~F.array_contains(F.coalesce(F.col("_boiler"), F.array()), x),
    )
    # collapse separator runs left by removed paragraphs, then trim
    cleaned = F.trim(
        F.regexp_replace(F.array_join(cleaned_arr, "\n"), "\n{3,}", "\n\n")
    )
    is_extracted = F.col(status_col) == "extracted"
    new_status = F.when(
        is_extracted & (F.length(cleaned) < MIN_CONTENT_LENGTH), F.lit("paywall")
    ).when(is_extracted, F.lit("cleaned")).otherwise(F.col(status_col))
    return (
        joined.withColumn("text_clean", F.when(is_extracted, cleaned))
        .withColumn(status_col, new_status)
        .drop("_boiler")
    )


def clean_articles(
    articles: DataFrame,
    host_col: str = "host",
    id_col: str = "url_hash",
    text_col: str = "text",
    status_col: str = "status",
    min_docs: int = MIN_DOCS,
    min_frac: float = MIN_FRAC,
) -> DataFrame:
    """Mine + apply in one call (the clean-articles pipeline stage).

    Shared column-name arguments are forwarded to BOTH stages — forwarding
    them only to mining would mine on the custom columns but join/filter on
    the defaults (ADVICE r2)."""
    patterns = mine_boilerplate(
        articles, host_col=host_col, id_col=id_col, text_col=text_col,
        min_docs=min_docs, min_frac=min_frac,
    )
    return apply_cleaning(
        articles, patterns, host_col=host_col, text_col=text_col,
        status_col=status_col,
    )
