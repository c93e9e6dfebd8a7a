"""Trainable BPE tokenizer: hand-computed merges, encode semantics,
distributed-encode parity, and the catalog entry's oracle."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from mizzounewscrawler_spark.operators.bpe import (
    bpe_encode,
    encode_word,
    train_bpe,
    word_histogram,
)

# the classic Sennrich corpus (no end-of-word marker in this
# implementation, so the expected merges are recomputed by hand):
#   low×5 lower×2 newest×6 widest×3
# pair counts: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 (n,e)=6 (e,w)=6 …
# tie at 9 → lexicographically smallest (e,s) first; after (e,s) the
# pair (es,t)=9 dominates; then the 7-tie resolves to (l,o).
CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_train_bpe_hand_computed_merges_and_ties():
    merges = train_bpe(CLASSIC, 3)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]


def test_train_bpe_stops_when_below_pair_floor():
    merges = train_bpe([("ab", 1), ("cd", 1)], 10, min_pair_count=2)
    assert merges == []


def test_encode_word_applies_lowest_rank_first():
    merges = train_bpe(CLASSIC, 3)
    ranks = {p: i for i, p in enumerate(merges)}
    # l,o,w,e,s,t → (e,s) → (es,t) → (l,o)
    assert encode_word("lowest", ranks) == ["lo", "w", "est"]
    assert encode_word("x", ranks) == ["x"]
    # all occurrences of a pair merge left-to-right in one pass
    assert encode_word("eses", {("e", "s"): 0}) == ["es", "es"]
    assert encode_word("eee", {("e", "e"): 0}) == ["ee", "e"]


def test_word_histogram_matches_counter(spark):
    texts = [
        ("the quick brown fox",),
        ("the lazy dog and the fox",),
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(texts, "text string")
    got = {
        r["word"]: r["n"] for r in word_histogram(df, "text").collect()
    }
    want = Counter(
        w for t, in texts if t for w in t.split()
    )
    assert got == dict(want)


def test_bpe_encode_distributed_matches_kernel(spark):
    corpus = [
        ("the newest lowering of the widest lowest rates",),
        ("newest newest low low low",),
    ]
    df = spark.createDataFrame(corpus, "text string")
    wc = sorted(
        (r["word"], r["n"])
        for r in word_histogram(df, "text").collect()
    )
    merges = train_bpe(wc, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = bpe_encode(df.repartition(4), "text", merges).collect()
    for r in rows:
        want = [
            tok for w in r["text"].split() for tok in encode_word(w, ranks)
        ]
        assert r["bpe_tokens"] == want
        # lossless: concatenating subwords reconstructs the words
        assert "".join(r["bpe_tokens"]) == r["text"].replace(" ", "")


def test_training_is_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [("newest widest lowest low lower",)] * 7, "text string"
    )
    outs = []
    for parts in (1, 8):
        wc = sorted(
            (r["word"], r["n"])
            for r in word_histogram(df.repartition(parts), "text").collect()
        )
        outs.append(train_bpe(wc, 10))
    assert outs[0] == outs[1]


def test_bpe_catalog_entry_matches_duckdb_oracle(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_BPE_TOKENIZE,
        q_bpe_tokenize,
    )

    got = q_bpe_tokenize(spark, "/root/testdata/sf0.001").toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(SQL_BPE_TOKENIZE).df()
    a = got.sort_values("word", ignore_index=True)
    b = want.sort_values("word", ignore_index=True)
    assert list(a["word"]) == list(b["word"])
    assert list(a["encoded"]) == list(b["encoded"])
    assert [int(x) for x in a["n"]] == [int(x) for x in b["n"]]
    assert [int(x) for x in a["n_subwords"]] == [
        int(x) for x in b["n_subwords"]
    ]
