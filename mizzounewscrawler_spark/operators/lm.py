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
    # bigram and context counts join SEPARATELY: a transition with a seen
    # context but unseen bigram must still smooth against c(prev) — a
    # single join on (prev, word) would zero the denominator for exactly
    # the out-of-domain transitions importance weighting cares about
    big = lm.select("prev", "word", "c_bigram")
    ctx = lm.select("prev", "c_prev").dropDuplicates(["prev"])
    scored = (
        tr.join(F.broadcast(big), ["prev", "word"], "left")
        .join(F.broadcast(ctx), ["prev"], "left")
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


def dsir_weights(
    docs: DataFrame,
    lm_target: DataFrame,
    lm_raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.1,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per doc, the average
    log-likelihood ratio between a TARGET-domain LM and a RAW-pool LM.
    With the bigram models here that ratio is exactly
    ``log₂ ppl_raw − log₂ ppl_target`` (both perplexities are
    2^(−mean log₂ P)), so one :func:`perplexity` pass per model suffices.
    Returns (id_col, n_tokens, log_ratio); higher = more target-like."""
    tgt = perplexity(docs, lm_target, id_col, text_col, k).select(
        id_col, "n_tokens", F.col("ppl").alias("_ppl_t")
    )
    raw = perplexity(docs, lm_raw, id_col, text_col, k).select(
        id_col, F.col("ppl").alias("_ppl_r")
    )
    return tgt.join(raw, id_col).select(
        id_col,
        "n_tokens",
        F.round(F.log2("_ppl_r") - F.log2("_ppl_t"), 6).alias("log_ratio"),
    )


def dsir_resample(
    weights: DataFrame,
    keep_frac: float = 0.25,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k importance resampling, deterministic: sampling without
    replacement ∝ exp(w) is exactly "add Gumbel noise to w, take the top
    k" (Gumbel-top-k trick), and the Gumbel draw here derives from an
    md5-hash uniform keyed by (seed, id) — reproducible on any cluster,
    any partitioning, and mirrorable in SQL.  Selection is by an exact
    score quantile (no global sort): kept ⇔ score > percentile(score,
    1−keep_frac), so ~keep_frac of rows survive (ties at the cut are
    excluded deterministically).  Returns the input plus ``score`` and
    ``kept``."""
    # 48-bit hash uniform in (0,1): (int(md5[:12],16) + 0.5) / 2^48
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))), 1, 12),
            16, 10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 48))
    gumbel = -F.log(-F.log(u))
    # natural-log weight: log_ratio is base-2
    score = F.round(
        F.col("log_ratio") * F.lit(float(__import__("math").log(2))) + gumbel, 6
    )
    w = weights.withColumn("score", score)
    cut = w.agg(
        F.percentile("score", F.lit(1.0 - keep_frac)).alias("_cut")
    )
    return w.crossJoin(F.broadcast(cut)).select(
        *weights.columns, "score", (F.col("score") > F.col("_cut")).alias("kept")
    )


def token_chi2_by_slice(
    docs: DataFrame, slice_col: str, text_col: str = "text"
) -> DataFrame:
    """Corpus-mixture diagnostic: per slice (source, dump, language…),
    the χ² statistic of its unigram distribution against the pooled
    corpus — "which slice's token mix deviates most", the check a
    mixture re-weighting (``mixture_sample``) or a new dump ingest runs
    before training.

    Algebra keeps the plan sparse: with o = count(token in slice),
    c = pooled count, n_s = slice total, n = corpus total, the full
    χ² = Σ_t (o − e)²/e over EVERY token (absent ones included, e =
    c·n_s/n) collapses to

        χ²(s) = (n / n_s) · Σ_present o² / c  −  n_s

    because Σo = Σe = n_s — so only (slice, token) pairs that actually
    occur are ever materialized: one token-keyed groupBy for pooled
    counts, one (slice, token) groupBy, a broadcast-joined ratio sum.
    Returns (slice_col, n_tokens, chi2, chi2_per_token); higher = more
    divergent from the pool.  χ² is rounded to 4 decimals (the ratio
    sum is the one floating step; all counts are exact)."""
    tok = docs.where(F.trim(F.col(text_col)) != "").select(
        F.col(slice_col).alias("_slice"),
        F.explode(
            F.transform(tokens_expr(F.col(text_col)), lambda t: F.lower(t))
        ).alias("token"),
    )
    pooled = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    per_slice = tok.groupBy("_slice", "token").agg(
        F.count(F.lit(1)).alias("o")
    )
    n_total = tok.count()
    ratio = (F.col("o") * F.col("o")).cast("double") / F.col("c")
    agg = (
        per_slice.join(F.broadcast(pooled), "token")
        .groupBy("_slice")
        .agg(F.sum("o").alias("n_tokens"), F.sum(ratio).alias("_r"))
    )
    chi2 = (F.lit(float(n_total)) / F.col("n_tokens")) * F.col("_r") - F.col(
        "n_tokens"
    )
    return agg.select(
        F.col("_slice").alias(slice_col),
        "n_tokens",
        F.round(chi2, 4).alias("chi2"),
        F.round(chi2 / F.col("n_tokens"), 6).alias("chi2_per_token"),
    )
