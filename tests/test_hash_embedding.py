"""Feature-hashing embeddings: bit-level Python reference, invariances,
and the text→vector→top-k catalog oracle."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from mizzounewscrawler_spark.functions.text import hash_embedding_expr


def _py_embed(text: str, dim: int) -> list[int]:
    v = [0] * dim
    for tok in text.split():
        h = hashlib.md5(tok.lower().encode()).hexdigest()
        b = int(h[:8], 16) % dim
        s = 1 if int(h[8], 16) < 8 else -1
        v[b] += s
    return v


def test_hash_embedding_matches_python_md5_reference(spark):
    texts = [
        ("The quick brown Fox jumps over the lazy dog",),
        ("spark spark spark duckdb",),
        ("",),
        (None,),
        ("one-token",),
    ]
    df = spark.createDataFrame(texts, "text string")
    got = [
        r["v"]
        for r in df.select(
            hash_embedding_expr(F.col("text"), 16).alias("v")
        ).collect()
    ]
    want = [_py_embed(t or "", 16) for t, in texts]
    assert got == want
    # empty / null text → the all-zero vector, shape-stable
    assert got[2] == [0] * 16 and got[3] == [0] * 16


def test_hash_embedding_is_order_invariant_and_additive(spark):
    """Bag-of-words semantics: token order never matters, and the
    embedding of concatenated texts is the sum of the embeddings."""
    df = spark.createDataFrame(
        [("alpha beta gamma delta",), ("delta gamma beta alpha",),
         ("alpha beta",), ("gamma delta",)],
        "text string",
    )
    vs = [
        r["v"]
        for r in df.select(
            hash_embedding_expr(F.col("text"), 8).alias("v")
        ).collect()
    ]
    assert vs[0] == vs[1]
    assert vs[0] == [a + b for a, b in zip(vs[2], vs[3])]


def test_hash_embed_topk_catalog_matches_duckdb(spark):
    import duckdb

    from mizzounewscrawler_spark.plans.relational import (
        SQL_HASH_EMBED,
        q_hash_embed_topk,
    )

    got = q_hash_embed_topk(spark, "/root/testdata/sf0.001").toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(SQL_HASH_EMBED).df()
    a = got.sort_values("doc_id", ignore_index=True)
    b = want.sort_values("doc_id", ignore_index=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert [int(x) for x in a["dot"]] == [int(x) for x in b["dot"]]
    assert [int(x) for x in a["vv"]] == [int(x) for x in b["vv"]]
    # IEEE-exact: correctly-rounded sqrt/divide of identical integers
    assert list(a["score"]) == list(b["score"])
    # the query doc ranks itself first at cosine 1.0
    top = got.iloc[0]
    assert top["doc_id"] == 7 and abs(top["score"] - 1.0) < 1e-12
