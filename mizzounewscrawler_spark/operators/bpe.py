"""Distributed BPE tokenizer training and encoding.

The scalable formulation (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the shape every
production subword trainer uses): the corpus-sized work is ONE
distributed word histogram (explode + groupBy on uniform word keys,
map-side combinable), and the merge loop then runs on the DRIVER over
the vocabulary-sized histogram — corpus-size-independent, exactly like
k-means centroid selection in ``similarity.semdedup``.  100 TB of text
and 1 GB of text with the same vocabulary pay the same merge-loop time;
only the histogram groupBy scales with the corpus, and it is the
cheapest shuffle shape Spark has.

Encoding is distributed again: the learned merge table (a few thousand
string pairs — KBs) ships to executors inside the Arrow-batched
``mapInPandas`` closure, and each batch encodes through a per-batch
word memo, so every DISTINCT word is encoded once per batch (Zipf makes
the hit rate very high on natural text).

Determinism contract (shared with the DuckDB oracle in
plans/relational.py::q_bpe_tokenize): training breaks count ties by
lexicographically smallest pair; encoding applies merges by ascending
rank, merging occurrences left-to-right — both integer/string-only, so
any engine replays them bit-identically.

Reference: the reference repo has no trainable tokenizer (token counts
only); this implements the round brief's training-data surface with
public-paper semantics.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.text import tokens_expr


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over whitespace tokens — the one corpus-sized stage.

    Explode rides the scan; the groupBy key is a uniform high-entropy
    string (partial aggregation map-side combines before the shuffle),
    and the output is vocabulary-sized: safe to collect for training."""
    return (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    word_counts: Iterable[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a (word, count) histogram.

    Driver-side classic BPE over the vocabulary (NOT the corpus): each
    word starts as its character sequence; each step merges the adjacent
    pair with the highest corpus-weighted count, ties broken by the
    lexicographically smallest (left, right) pair — fully deterministic.
    Stops early when no pair reaches ``min_pair_count``.  O(num_merges ×
    Σ|word|) — seconds for real vocabularies, independent of corpus TB.
    """
    vocab: list[tuple[list[str], int]] = [
        (list(w), int(n)) for w, n in word_counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, n in vocab:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # max count first; at the max, the lexicographically smallest pair
        top = max(counts.values())
        if top < min_pair_count:
            break
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        l, r = best_pair
        fused = l + r
        for idx, (toks, n) in enumerate(vocab):
            if l not in toks:
                continue
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(fused)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[idx] = (out, n)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-rank adjacent pair present, occurrences left-to-right.

    Equivalent to applying each merge exhaustively in ascending rank
    order (a merge's constituent tokens are always products of earlier
    merges, so a later merge can never re-enable an earlier one) — the
    form the DuckDB oracle replays."""
    toks = list(word)
    while len(toks) > 1:
        best_rank, best_pair = None, None
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        # merge all left-to-right occurrences of the best-rank pair
        l, r_ = best_pair
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r_:
                out.append(l + r_)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """(rank, left, right) — the persistable tokenizer artifact."""
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string",
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Distributed encode: append ``out_col`` (array<string>) of subword
    tokens.  The merge table travels in the task closure (KBs); each
    Arrow batch keeps a word→tokens memo so distinct words encode once.
    Pure per-row map — no shuffle, rides whatever scan feeds it."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {p: i for i, p in enumerate(merges)}
    # fresh StructType: StructType.add would MUTATE df's cached schema
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )
    cols = [f.name for f in out_schema.fields]

    # ASCII \s+, matching tokens_expr's Java regex (Java \s is ASCII by
    # default) and the DuckDB mirror's RE2 \s — Python str.split() would
    # additionally split on Unicode whitespace (NBSP, thin space), making
    # the encoder see different words than the trained histogram
    ws = re.compile(r"\s+", re.ASCII)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            encoded = []
            for text in pdf[text_col]:
                toks: list[str] = []
                if text is not None:
                    for w in ws.split(str(text).strip()):
                        if not w:
                            continue
                        got = memo.get(w)
                        if got is None:
                            got = encode_word(w, ranks)
                            memo[w] = got
                        toks.extend(got)
                encoded.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = encoded
            yield pdf[cols]

    return df.mapInPandas(run, out_schema)
