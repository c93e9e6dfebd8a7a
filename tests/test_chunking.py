"""Document chunking: window coverage, overlap carry, and the no-shuffle
plan.  Oracle parity of the `chunk_documents` catalog entry is covered by
test_entry_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mizzounewscrawler_spark.operators.chunking import chunk_documents


def test_chunks_cover_text_exactly(spark):
    text = "".join(chr(97 + i % 26) for i in range(1234))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "text", size=500, overlap=100).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 400 over 1234 chars: starts < 1234-100 -> 0,400,800 (a chunk
    # at 1200 would be fully contained in chunk 800 — phantom tail)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["chunk_start"] for r in rows] == [0, 400, 800]
    for r in rows:
        assert r["chunk"] == text[r["chunk_start"] : r["chunk_start"] + 500]
    # overlap carry: each chunk's first 100 chars == previous chunk's
    # chars [400:500]
    for prev, cur in zip(rows, rows[1:]):
        if len(prev["chunk"]) == 500:
            assert cur["chunk"][:100] == prev["chunk"][400:500]
    # lossless reconstruction: strided prefixes + the last chunk whole
    assert "".join(r["chunk"][:400] for r in rows[:-1]) + rows[-1]["chunk"] == text


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, "text", size=500, overlap=100).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["chunk"] == "tiny"
    assert rows[0]["chunk_id"] == 0 and rows[0]["chunk_start"] == 0


def test_exact_multiple_no_phantom_tail(spark):
    # len == 2*stride: starts at 0 and stride only (no start == len)
    df = spark.createDataFrame([(1, "x" * 800)], ["doc_id", "text"])
    rows = chunk_documents(df, "text", size=500, overlap=100).collect()
    assert sorted(r["chunk_start"] for r in rows) == [0, 400]
    # len % stride within (0, overlap]: the tail would be fully contained
    # in the previous window — must NOT be emitted (450 <= 0 + size)
    df2 = spark.createDataFrame([(1, "y" * 450)], ["doc_id", "text"])
    rows2 = chunk_documents(df2, "text", size=500, overlap=100).collect()
    assert [r["chunk_start"] for r in rows2] == [0]
    assert len(rows2[0]["chunk"]) == 450


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", size=100, overlap=100)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", size=100, overlap=-1)


def test_chunking_plan_has_no_exchange(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        chunk_documents(df, "text", size=10, overlap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def _pack_twin(items, budget):
    """Sequential reference: next-fit greedy over (id, w) sorted by id."""
    out, cur, cur_w = [], [], 0

    def flush():
        if cur:
            out.append((len(out), list(cur), cur_w, cur_w > budget))

    for _id, w in sorted(items):
        if w > budget:
            flush()
            cur[:], cur_w = [_id], w
            flush()
            cur[:], cur_w = [], 0
            continue
        if cur_w + w > budget:
            flush()
            cur[:], cur_w = [], 0
        cur.append(_id)
        cur_w += w
    flush()
    return out


def test_pack_sequences_matches_sequential_twin(spark):
    from mizzounewscrawler_spark.operators.chunking import pack_sequences

    rng = [(i, 48 + (i * 97) % 500) for i in range(400)]
    df = spark.createDataFrame(rng, ["doc_id", "w"]).repartition(11)
    got = pack_sequences(
        df, "doc_id", "w", budget=600, n_buckets=8,
        bucket_of=F.pmod(F.col("doc_id"), F.lit(8)),
    ).collect()
    for b in range(8):
        want = _pack_twin([(i, w) for i, w in rng if i % 8 == b], 600)
        rows = sorted((r for r in got if r["bucket"] == b),
                      key=lambda r: r["seq_id"])
        assert [(r["seq_id"], list(r["item_ids"]), r["total_weight"],
                 r["oversize"]) for r in rows] == want, b


def test_pack_sequences_invariants(spark):
    from mizzounewscrawler_spark.operators.chunking import pack_sequences

    rng = [(i, 100 + (i * 37) % 900) for i in range(300)]  # some > budget
    df = spark.createDataFrame(rng, ["doc_id", "w"])
    rows = pack_sequences(df, "doc_id", "w", budget=512).collect()
    packed = [i for r in rows for i in r["item_ids"]]
    assert sorted(packed) == [i for i, _ in rng]  # every item exactly once
    for r in rows:
        assert r["total_weight"] <= 512 or (r["oversize"] and r["n_items"] == 1)


def test_pack_sequences_parallelism_invariant(spark):
    from mizzounewscrawler_spark.operators.chunking import pack_sequences

    rng = [(i, 50 + (i * 13) % 300) for i in range(500)]
    key = lambda rows: sorted(
        (r["bucket"], r["seq_id"], tuple(r["item_ids"])) for r in rows
    )
    a = pack_sequences(
        spark.createDataFrame(rng, ["doc_id", "w"]).repartition(1),
        "doc_id", "w", budget=400,
    ).collect()
    b = pack_sequences(
        spark.createDataFrame(rng, ["doc_id", "w"]).repartition(29),
        "doc_id", "w", budget=400,
    ).collect()
    assert key(a) == key(b)
