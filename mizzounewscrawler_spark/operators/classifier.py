"""Trained linear quality classifier — the GPT-3/LLaMA "quality filter" seam.

GPT-3 (Brown et al. 2020, appendix A), LLaMA, and PaLM gate web documents
with a binary classifier trained to separate a high-quality reference
corpus (WebText / Wikipedia / books) from raw CommonCrawl, keeping
documents the classifier scores as reference-like.  The reference crawler
has no trained-filter stage (its quality gates are the rule panels in
``src/pipeline/url_filters.py`` and length gates); this operator supplies
the pipeline seam those published systems add on top.

The dataflow is restated Spark-first with a difference-of-rates linear
text classifier (the Rocchio/centroid form).  Per token::

    weight(t) = c_pos(t) * N_neg  -  c_neg(t) * N_pos

where ``c_class(t)`` is the token's occurrence count inside that class and
``N_class`` the class's total token count — i.e. the cross-multiplied
difference of per-class token RATES ``c_pos/N_pos - c_neg/N_neg``, kept in
exact BIGINT so training and scoring are bit-identical across engines,
partitionings, and summation orders (no ``ln()`` anywhere: a fastText or
NB log-odds weight table is a drop-in swap on the same scoring plan — the
seam is the weight DataFrame's (token, weight) shape, not the arithmetic).

    score(doc) = sum_t tf(doc, t) * weight(t)

is sign-calibrated: positive reads "more positive-class-like", and a
threshold of 0 is the natural rate-balance cut.

Scale notes (100 TB):

* Train on a labeled SAMPLE — the published pipelines train on 10^6–10^7
  labeled documents, never the full corpus.  That bounds every class count
  below 2^31 and every cross product below 2^62: BIGINT-safe by contract
  (``classifier_weights`` raises if the totals breach the bound rather
  than silently overflowing).
* The weight table is vocabulary-sized — a broadcast dimension.
* Scoring is scan → explode → per-doc tf groupBy → broadcast hash join →
  per-doc sum: ONE shuffle, keyed by the uniform doc id; the tf groupBy
  and the final sum both combine map-side.

Tokenization is the shared whitespace/lowercase convention of the other
text operators (``tokens_expr``), so the DuckDB mirror is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.text import tokens_expr

# With both class token totals below this, every weight product fits in
# int64 with headroom (2^31 * 2^31 < 2^62).  Training sets above it must
# be subsampled — which is what the published quality-filter pipelines do
# anyway.
MAX_CLASS_TOKENS = 1 << 31


def _doc_tokens(df: DataFrame, cols: list, text_col: str) -> DataFrame:
    toks = F.transform(tokens_expr(F.col(text_col)), lambda x: F.lower(x))
    return df.where(F.trim(F.col(text_col)) != "").select(
        *cols, F.explode(toks).alias("token")
    )


def classifier_weights(
    train: DataFrame,
    positive: F.Column,
    text_col: str = "text",
) -> DataFrame:
    """Train the weight table: (token, weight) with BIGINT
    ``weight = c_pos*N_neg - c_neg*N_pos``.

    ``positive`` is a boolean Column over ``train`` marking the
    high-quality class.  Two groupBys on the uniform token key plus one
    scalar total — the model never exceeds vocabulary size.  Raises if a
    class's token total breaches the int64-safety contract (subsample the
    training set instead)."""
    tok = _doc_tokens(
        train.select(positive.alias("_pos"), text_col), ["_pos"], text_col
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg")
    ).collect()[0]
    n_pos, n_neg = int(totals["n_pos"] or 0), int(totals["n_neg"] or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("classifier_weights: both classes need tokens")
    if max(n_pos, n_neg) >= MAX_CLASS_TOKENS:
        raise ValueError(
            "classifier_weights: class token total exceeds the int64-exact "
            "bound — subsample the labeled training set (the published "
            "quality filters train on 10^6-10^7 docs, not the corpus)"
        )
    return counts.select(
        "token",
        (
            F.col("c_pos") * F.lit(n_neg) - F.col("c_neg") * F.lit(n_pos)
        ).cast("long").alias("weight"),
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a trained weight table: (id_col, n_tokens,
    score) with ``score = sum tf*weight`` (exact BIGINT; tokens absent
    from the model contribute 0).  Empty docs are dropped — nothing to
    score.  Plan: explode → broadcast-join the vocabulary-sized model →
    ONE doc-keyed groupBy.  No per-(doc, token) tf stage: summing the
    joined weight per occurrence is the same arithmetic, and the partial
    aggregation collapses each task's exploded rows to one row per doc
    before the single shuffle — a tf pre-aggregation would only add a
    second exchange on the wider (doc, token) key."""
    tok = _doc_tokens(docs.select(id_col, text_col), [id_col], text_col)
    return (
        tok.join(F.broadcast(weights), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("score"),
        )
    )


def quality_gate(
    scored: DataFrame, threshold: int = 0, score_col: str = "score"
) -> DataFrame:
    """Keep verdicts at an integer score threshold (default 0 — the exact
    rate-balance cut).  GPT-3 instead kept low-scoring docs with
    probability score-dependent (a Pareto lottery); that variant is the
    same plan with the md5-hash-uniform trick ``dsir_resample`` uses."""
    return scored.withColumn("keep", F.col(score_col) > F.lit(threshold))
