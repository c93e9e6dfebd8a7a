"""Passage-level corpus hygiene: repeated-passage removal + decontamination.

Two standard LLM-training-data operators the reference engine has no analog
for (its dedup story stops at whole-article url/content hashes,
/root/reference/src/crawler/url_verification.py):

* **passage_dedup** — the C4/RefinedWeb "remove any line that repeats
  across the corpus" rule, re-expressed over fixed-size token windows
  (documents here are single-line token streams, so the passage unit is a
  deterministic ``window_tokens`` window rather than a newline split; swap
  the splitter for ``split(text, '\\n')`` on naturally-lined corpora).  A
  passage that occurs in ``min_docs``+ distinct documents is boilerplate
  (navigation chrome, cookie banners, syndicated footers); every
  occurrence is dropped and each document's text is reconstructed from its
  surviving passages in order.

* **decontaminate** — benchmark n-gram decontamination (the GPT-3 appendix
  C / Dolma recipe): any corpus document sharing an ``n``-token n-gram
  with a benchmark/eval document is flagged, with the overlap count, so
  downstream can drop or audit it.

Scale shape (both): one explode to corpus-token volume, shuffles keyed on
the passage/n-gram STRING — uniform by construction (hash partitioning on
high-entropy text keys has no skew; a pathological single-passage corpus
degrades to one reducer exactly like any groupBy and is exactly the
boilerplate the operator exists to remove).  ``passage_dedup`` is two
shuffles (occurrence count on passage, reconstruction on doc id) — the
same cost C4's original MapReduce paid.  ``decontaminate`` broadcasts the
benchmark side (eval suites are MBs, corpus is the 100-TB side, which
streams map-side through the broadcast hash join).  Per-doc state in the
reconstruction is one document's passage list — bounded by the longest
document, same bound as extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.text import bind_once, tokens_expr


def passage_windows(text: Column, window: int) -> Column:
    """Array of consecutive ``window``-token passages (last one may be
    shorter); empty array for blank text.  Pure JVM — rides the scan.
    The token array is bound once (bind_once): capturing it inside the
    per-window lambda would re-tokenize the document per window."""

    def _inner(toks: Column) -> Column:
        n = F.size(toks)
        nwin = ((n + F.lit(window - 1)) / F.lit(window)).cast("int")
        return F.when(n > 0, F.transform(
            F.sequence(F.lit(0), nwin - F.lit(1)),
            lambda i: F.array_join(
                F.slice(toks, i * F.lit(window) + F.lit(1), window), " "
            ),
        )).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens_expr(text), _inner)


def explode_passages(
    df: DataFrame, text_col: str, id_col: str, window: int
) -> DataFrame:
    """(id, pos, passage) — one row per token window, pos 0-based."""
    return df.select(
        F.col(id_col),
        F.posexplode(passage_windows(F.col(text_col), window)).alias(
            "pos", "passage"
        ),
    )


def passage_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Drop every passage that occurs in ≥ ``min_docs`` distinct documents;
    reconstruct each document from its surviving passages.

    Returns one row per input document: ``(id, n_passages, n_dropped,
    clean_text)`` — ``clean_text`` is the in-order join of kept passages
    ('' when everything was boilerplate).  Exact, deterministic, and
    partitioning-independent: occurrence counts come from a distinct
    (passage, id) groupBy, reconstruction sorts by the passage position.
    """
    p = explode_passages(df, text_col, id_col, window)
    occ = (
        p.select("passage", id_col)
        .distinct()
        .groupBy("passage")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    boiler = occ.where(F.col("_nd") >= min_docs).select(
        "passage", F.lit(True).alias("_boiler")
    )
    flagged = p.join(boiler, "passage", "left")
    kept_struct = F.when(
        F.col("_boiler").isNull(), F.struct(F.col("pos"), F.col("passage"))
    )  # no otherwise → null; collect_list skips nulls
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("_boiler"), 1).otherwise(0)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["passage"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def ngrams_distinct(text: Column, n: int) -> Column:
    """Distinct ``n``-token shingles of ``text`` (empty when < n tokens).
    Token array bound once — see :func:`passage_windows`."""

    def _inner(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens_expr(text), _inner)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Flag corpus documents sharing any ``n``-token n-gram with the
    benchmark set: returns ``(id, n_matched)`` — n_matched = how many
    distinct corpus-doc n-grams hit the benchmark.  Clean documents are
    absent (anti-join against this result to keep them).

    The benchmark n-gram set is broadcast (eval suites are small); the
    corpus side explodes its distinct per-doc n-grams and streams through
    the broadcast hash join map-side — no corpus shuffle until the final
    per-doc count, which carries only matching rows.
    """
    bench_ng = (
        benchmark.select(
            F.explode(ngrams_distinct(F.col(text_col), n)).alias("_g")
        )
        .distinct()
    )
    corpus_ng = corpus.select(
        F.col(id_col),
        F.explode(ngrams_distinct(F.col(text_col), n)).alias("_g"),
    )
    return (
        corpus_ng.join(F.broadcast(bench_ng), "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


def exact_substring_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 20,
    min_docs: int = 2,
    key_hash: str = "md5",
) -> DataFrame:
    """ExactSubstr-style duplicate-span removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", §3.1) —
    the SLIDING-window complement to :func:`passage_dedup`'s
    non-overlapping C4 windows: a repeated run of ≥ ``window`` tokens is
    caught at ANY offset (cross-boundary repeats that fixed windows
    miss), and every token covered by a cross-document repeat is removed.

    The paper builds a suffix array; restated for Spark the same result
    comes from hashed sliding windows — for each 1-based start i ≤
    n−window+1, key = md5 of the space-joined window.  Exact token runs
    hash equal, so a window key appearing in ≥ ``min_docs`` DISTINCT
    documents marks its covered span [i, i+window) for removal in every
    document carrying it.  (md5 collisions are the only approximation:
    ~2⁻¹²⁸ per pair — below any practical concern, and the DuckDB mirror
    hashes identically so parity is exact.)

    Returns one row per non-empty document: ``(id_col, n_tokens,
    n_removed, clean_text)`` — surviving tokens rejoined in order.
    Documents shorter than ``window`` have no windows and survive whole.

    ``key_hash``: the window-key hash.  "md5" (default) is pinned by the
    DuckDB oracle (both engines hash identically, so parity is exact);
    "xxhash64" is the SCALE path — 8-byte long keys instead of 32-char
    hex strings cut the dominant (window-key) shuffle roughly 3x with
    identical output (the keys never leave the operator; collision odds
    rise to ~2^-64 per pair, still irrelevant at 10^10 windows;
    output-parity pinned in tests/test_passages.py).

    Plan shape (every shuffle on a uniform high-entropy key): window keys
    groupBy(md5) → hot-key set; flagged windows explode to covered token
    positions (distinct (doc, pos) — only FLAGGED spans pay the ×window
    fan-out); tokens left-join the removal mask on (doc, pos); one final
    doc-keyed groupBy rebuilds the text.  Like the paper's MapReduce
    deployment, total work is O(total tokens) rows with ~O(window) chars
    hashed per row.
    """
    toks = tokens_expr(F.col(text_col))
    base = df.where(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("id"), toks.alias("tk")
    )
    tokens = base.select(
        "id", F.posexplode("tk").alias("pos0", "tok")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "tok")

    if key_hash not in ("md5", "xxhash64"):
        raise ValueError(f"key_hash must be md5|xxhash64, got {key_hash!r}")
    key_fn = F.md5 if key_hash == "md5" else F.xxhash64
    key_type = "string" if key_hash == "md5" else "bigint"

    def _grams(tk: Column) -> Column:
        n = F.size(tk)
        return F.when(
            n >= window,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(window - 1)),
                lambda i: F.struct(
                    i.alias("gpos"),
                    key_fn(
                        F.array_join(F.slice(tk, i, window), " ")
                    ).alias("key"),
                ),
            ),
        ).otherwise(
            F.array().cast(f"array<struct<gpos:int,key:{key_type}>>")
        )

    grams = base.select(
        "id", F.explode(bind_once(F.col("tk"), _grams)).alias("g")
    ).select("id", F.col("g.gpos").alias("gpos"), F.col("g.key").alias("key"))
    hot = (
        grams.groupBy("key")
        .agg(F.countDistinct("id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("key")
    )
    removed = (
        grams.join(hot, "key")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    kept_struct = F.when(
        F.col("_rm").isNull(), F.struct(F.col("pos"), F.col("tok"))
    )
    return (
        tokens.join(removed, ["id", "pos"], "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_rm"), 1).otherwise(0)).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .withColumnRenamed("id", id_col)
    )
