"""CCNet-style n-gram LM perplexity scoring and quality bucketing.

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores every document's perplexity under a
language model trained on a clean reference corpus and splits the crawl
into head / middle / tail buckets at per-language perplexity quantiles —
the standard quality gate in LLM data pipelines (also used by Dolma,
RedPajama).  CCNet uses a 5-gram KenLM; this restates the same dataflow
with an add-k-smoothed BIGRAM model so the whole thing is exact,
deterministic, JVM-native, and DuckDB-mirrorable:

* :func:`ngram_lm` — one pass over the reference corpus: explode
  (prev, word) transitions (with a ``<s>`` start token), count bigrams
  and unigram contexts.  Two groupBys on uniform token keys; the model is
  dimension-sized (vocabulary²-bounded, in practice ≪ corpus).
* :func:`perplexity` — explode each document's transitions, broadcast-join
  the LM counts, sum log₂ P(w|prev) with add-k smoothing per doc,
  ppl = 2^(−Σ/n).  One shuffle, keyed by doc id.
* :func:`ccnet_buckets` — exact per-language perplexity quantiles
  (head/middle cut fractions) computed with ``percentile`` and broadcast
  back; docs label head / middle / tail (head = lowest perplexity).

At 100 TB: the LM is a broadcast dim (top-V vocabulary if needed), the
scoring pass is scan + broadcast join + one doc-keyed groupBy — the same
shape as the token-count statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.text import bind_once, tokens_expr

START = "<s>"


def _transitions(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(id_cols..., prev, word) — one row per bigram transition, with a
    ``<s>`` start context so 1-token docs still score one transition."""
    toks = F.transform(tokens_expr(F.col(text_col)), lambda t: F.lower(t))

    def _pairs(ts):
        shifted = F.concat(F.array(F.lit(START)), F.slice(ts, 1, 2_000_000))
        return F.zip_with(
            F.slice(shifted, 1, F.size(ts)),
            ts,
            lambda p, w: F.struct(p.alias("prev"), w.alias("word")),
        )

    return (
        df.select(*id_cols, F.explode(bind_once(toks, _pairs)).alias("t"))
        .select(*id_cols, F.col("t.prev").alias("prev"), F.col("t.word").alias("word"))
    )


def ngram_lm(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram LM counts from a reference corpus: one row per (prev, word)
    with ``c_bigram``, the context total ``c_prev``, and the vocabulary
    size ``vocab`` (distinct words, start token excluded) on every row —
    denormalized so scoring needs a single broadcast join."""
    tr = _transitions(corpus.select(text_col), [], text_col)
    big = tr.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("c_bigram"))
    ctx = tr.groupBy("prev").agg(F.count(F.lit(1)).alias("c_prev"))
    vocab = tr.select(F.countDistinct("word").alias("vocab"))
    return big.join(ctx, "prev").crossJoin(F.broadcast(vocab))


def perplexity(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.1,
) -> DataFrame:
    """Per-document bigram perplexity under ``lm`` with add-k smoothing:
    P(w|prev) = (c(prev,w) + k) / (c(prev) + k·(V+1)); unseen contexts
    back off to the uniform k/(k·(V+1)).  Returns (id_col, n_tokens,
    ppl) with ppl = 2^(−Σ log₂ P / n); docs with no tokens are dropped
    (nothing to score).  The +1 in V+1 reserves unk mass."""
    tr = _transitions(docs.select(id_col, text_col), [id_col], text_col)
    vocab = lm.select(F.max("vocab").alias("vocab"))
    scored = (
        tr.join(F.broadcast(lm.select("prev", "word", "c_bigram", "c_prev")),
                ["prev", "word"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                F.log2(
                    (F.coalesce(F.col("c_bigram"), F.lit(0)) + F.lit(k))
                    / (
                        F.coalesce(F.col("c_prev"), F.lit(0))
                        + F.lit(k) * (F.col("vocab") + F.lit(1))
                    )
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.pow(F.lit(2.0), -F.sum("lp") / F.count(F.lit(1))), 4).alias(
            "ppl"
        ),
    )


def ccnet_buckets(
    scored: DataFrame,
    by: str | None = "lang",
    head_frac: float = 0.1,
    middle_frac: float = 0.4,
) -> DataFrame:
    """Label each scored doc head / middle / tail at per-group perplexity
    quantiles (CCNet §4.4: head = cleanest ``head_frac`` by LOWEST
    perplexity, middle = next ``middle_frac``, tail = rest).  Exact
    ``percentile`` thresholds per group, broadcast back — no global sort."""
    keys = [by] if by else []
    grp = scored.groupBy(*keys) if keys else scored.groupBy()
    cuts = grp.agg(
        F.percentile("ppl", F.lit(head_frac)).alias("_t_head"),
        F.percentile("ppl", F.lit(head_frac + middle_frac)).alias("_t_mid"),
    )
    joined = (
        scored.join(F.broadcast(cuts), keys) if keys
        else scored.crossJoin(F.broadcast(cuts))
    )
    return joined.select(
        *scored.columns,
        F.when(F.col("ppl") <= F.col("_t_head"), "head")
        .when(F.col("ppl") <= F.col("_t_mid"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
