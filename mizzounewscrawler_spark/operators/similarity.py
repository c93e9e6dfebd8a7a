"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators (no reference counterpart — the reference
has no vector search; these are the engine's scale additions):

- :func:`cosine_topk` — exact brute-force top-k neighbours of a query vector,
  computed with native higher-order functions (``zip_with`` + ``aggregate``)
  entirely JVM-side.  O(n·d) scan; the correctness baseline.
- :func:`lsh_ann_topk` — random-hyperplane (sign) LSH bucketing: probe only
  candidates sharing the query's bucket in ≥1 of ``num_tables`` tables.  At
  100 TB this turns a full scan into a few bucket-joins; recall tunable via
  (num_tables, hyperplanes_per_table).
- :func:`embedding_neardup_pairs` — all pairs with cosine ≥ threshold via
  LSH-bucket self-join (near-dup dedup on embeddings).

Determinism: hyperplanes derive from a seeded hash of (table, plane, dim) —
no RNG state, reproducible across runs and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.urls import xxhash64


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    The per-row score is a pure column expression (whole-stage codegen); the
    top-k is ``orderBy(...).limit(k)`` which Spark executes as a distributed
    TakeOrdered (per-partition heap, no full sort/shuffle).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_expr(v, q), round_to).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col).asc()).limit(k)


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from xxhash64."""
    return [
        (xxhash64(f"lsh:{table}:{plane}:{d}".encode()) / float(1 << 63))
        for d in range(dim)
    ]


def signature_expr(vec: Column, table: int, planes: int, dim: int) -> Column:
    """Sign-LSH bucket id for one table: bit b = sign(vec · hyperplane_b)."""
    acc = F.lit(0).cast("long")
    for p in range(planes):
        h = F.array(*[F.lit(v) for v in _hyperplane(table, p, dim)])
        bit = F.when(dot_expr(vec.cast("array<double>"), h) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        acc = acc * 2 + bit
    return acc


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    num_tables: int = 4,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows sharing an LSH bucket with the query."""
    dim = dim or len(query_vec)
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame([(list(map(float, query_vec)),)], f"{vec_col} array<double>")
    v = F.col(vec_col)
    cand = None
    for t in range(num_tables):
        sig = signature_expr(v, t, planes, dim)
        qsig = qdf.select(sig.alias("qsig")).collect()[0]["qsig"]
        part = embeddings.where(sig == F.lit(qsig))
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.dropDuplicates([id_col])
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 16,
    num_tables: int = 6,
    planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) via LSH self-join.

    Bucket on (table, signature), join within buckets, exact-verify the
    cosine — the embedding analog of MinHash-LSH for text.
    """
    sigs = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        signature_expr(F.col(vec_col), t, planes, dim).alias("sig"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("b"),
    ).select("id", "v", F.col("b.t").alias("t"), F.col("b.sig").alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.round(cosine_expr(F.col("va"), F.col("vb")), 6)
    return cand.select("id_a", "id_b", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )
