"""Recall oracles for the approximate similarity/dedup paths (VERDICT r1 #7).

The LSH/IVF/MinHash operators are not SQL-expressible (xxhash64-derived
hyperplanes / signatures), so the driver records them rows-only.  These
tests supply the missing correctness bar:

- ANN paths (lsh_ann_topk, ivf_topk): recall@10 >= 0.9 against the exact
  cosine_topk baseline on the sf0.01 embeddings table.
- MinHash-LSH / SimHash candidate generation: recall against the exact
  n-gram Jaccard ground truth on the same corpus.
- Zero-norm guard: a zero vector must never win an IVF cell assignment via
  NaN-cosine ordering.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mizzounewscrawler_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from mizzounewscrawler_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
    query_signature,
    signature_expr,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return [float(x) for x in row]


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


@pytest.fixture(scope="module")
def planted(spark, qvec):
    """sf0.01 embeddings (near-random, top-10 cosine ~0.3 — outside any LSH
    regime) + 12 planted near-neighbors of the query (small deterministic
    perturbations, cosine >= ~0.95).  ANN recall is asserted on the planted
    set: the contract of LSH/IVF is recalling *near* neighbors."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(
        F.col("vec_id") > 0
    )
    rows = []
    for i in range(12):
        noisy = [
            x + 0.03 * ((7 * i + d) % 5 - 2) for d, x in enumerate(qvec)
        ]
        rows.append((10_000 + i, noisy))
    extra = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    df = base.select(
        F.col("vec_id").cast("int").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).unionByName(extra).cache()
    df.count()
    return df


def test_lsh_ann_recall_at_10(spark, planted, qvec):
    exact = set(_ids(cosine_topk(planted, qvec, k=10)))
    assert all(i >= 10_000 for i in exact)  # planted rows dominate top-10
    approx = set(_ids(lsh_ann_topk(planted, qvec, k=10, probe_radius=1)))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH ANN recall@10 {recall} < 0.9"


def test_lsh_multiprobe_recall_monotone(spark, planted, qvec):
    """Raising probe_radius can only widen the candidate set."""
    big = 10**6  # k > corpus: both calls return their full candidate set
    r0 = set(_ids(lsh_ann_topk(planted, qvec, k=big, probe_radius=0)))
    r1 = set(_ids(lsh_ann_topk(planted, qvec, k=big, probe_radius=1)))
    assert r0 <= r1


def test_ivf_ann_recall_at_10(spark, planted, qvec):
    exact = set(_ids(cosine_topk(planted, qvec, k=10)))
    approx = set(_ids(ivf_topk(planted, qvec, k=10, n_centroids=16, nprobe=4)))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF ANN recall@10 {recall} < 0.9"


def test_ivf_fullprobe_equals_exact(spark, emb, qvec):
    """nprobe == n_centroids probes every cell -> must equal exact top-k."""
    base = emb.where(F.col("vec_id") > 0)
    exact = _ids(cosine_topk(base, qvec, k=10))
    full = _ids(ivf_topk(base, qvec, k=10, n_centroids=8, nprobe=8))
    assert exact == full


def test_query_signature_matches_spark_expr(spark, qvec):
    """Driver-side query_signature must equal the Spark-side signature_expr
    on the same vector (the one-scan LSH filter depends on this parity)."""
    df = spark.createDataFrame([(qvec,)], "v array<double>")
    for t in range(4):
        spark_sig = df.select(
            signature_expr(F.col("v"), t, 8, len(qvec)).alias("s")
        ).collect()[0]["s"]
        assert spark_sig == query_signature(qvec, t, 8), f"table {t}"


def test_ivf_zero_vector_guard(spark):
    """A zero vector's cosine vs every centroid is undefined (0/0); the guard
    pins it to -2.0 so NaN never wins the array_max cell assignment and the
    query itself still returns clean top-k."""
    rows = [(i, [float(i % 3 + 1), float(i % 5)]) for i in range(1, 40)]
    rows.append((99, [0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = ivf_topk(df, [1.0, 0.5], k=5, n_centroids=4, nprobe=4)
    got = out.collect()
    assert len(got) == 5
    assert all(r["cosine"] == r["cosine"] for r in got)  # no NaN scores


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    df.count()
    return df


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def test_minhash_candidate_recall_vs_exact_jaccard(spark, docs):
    """MinHash-LSH candidates must cover >= 0.9 of the truly-similar pairs
    (exact n-gram Jaccard >= 0.8 ground truth)."""
    truth = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8))
    assert truth, "fixture corpus must contain near-dup pairs"
    cand = _pairs(minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=8))
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"MinHash candidate recall {recall} < 0.9"


def test_simhash_candidate_recall_vs_exact_jaccard(spark, docs):
    """SimHash(hamming<=8) candidates cover >= 0.9 of exact-Jaccard>=0.9 pairs."""
    truth = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.9))
    assert truth, "fixture corpus must contain near-identical pairs"
    cand = _pairs(simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=8))
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"SimHash candidate recall {recall} < 0.9"


def test_ngram_jaccard_df_cap_keeps_high_threshold_pairs(spark, docs):
    """The hot-shingle document-frequency cap must not lose near-identical
    pairs: rare shingles carry them.  (Cap approximates common-counts from
    below, so it can only shrink jaccard - verify survivors.)"""
    exact = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.9))
    capped = _pairs(
        ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.85, max_df=20)
    )
    missing = exact - capped
    assert not missing, f"df-cap lost near-identical pairs: {sorted(missing)[:5]}"


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023)
# --------------------------------------------------------------------------


def test_semdedup_kernel_parity(spark, emb):
    """The JVM pair-join oracle path and the applyInPandas matmul scale
    path must produce identical verdicts on the fixture embeddings."""
    from mizzounewscrawler_spark.operators.similarity import semdedup

    a = semdedup(emb, n_clusters=8, threshold=0.30, kernel="join")
    b = semdedup(emb, n_clusters=8, threshold=0.30, kernel="pandas")
    pa = {r["vec_id"]: r["kept"] for r in a.collect()}
    pb = {r["vec_id"]: r["kept"] for r in b.collect()}
    assert pa == pb
    assert len(pa) == emb.count()
    # the prune must actually fire on this fixture
    assert any(not v for v in pa.values())
    assert any(v for v in pa.values())


def test_semdedup_assign_mode_parity(spark, emb):
    """The distributed join-based centroid assignment (centroids never
    touch the driver) must reproduce the literal-broadcast assignment
    exactly — cells, rounded sims, and final verdicts — including through
    a Lloyd refinement round where assignment drift would compound."""
    from mizzounewscrawler_spark.operators.similarity import (
        semdedup,
        semdedup_assign,
    )

    for iters in (0, 1):
        lit = semdedup_assign(emb, n_clusters=8, iters=iters)
        jn = semdedup_assign(
            emb, n_clusters=8, iters=iters, assign_mode="join"
        )
        pl = {r["id"]: (r["cell"], r["centroid_sim"]) for r in lit.collect()}
        pj = {r["id"]: (r["cell"], r["centroid_sim"]) for r in jn.collect()}
        assert pl == pj
    a = semdedup(emb, n_clusters=8, threshold=0.30)
    b = semdedup(emb, n_clusters=8, threshold=0.30, assign_mode="join")
    va = {r["vec_id"]: r["kept"] for r in a.collect()}
    vb = {r["vec_id"]: r["kept"] for r in b.collect()}
    assert va == vb


def test_semdedup_planted_duplicates(spark):
    """Exact duplicate vectors land in one cluster and all but the
    earliest (lowest id at equal centroid_sim) are removed."""
    from mizzounewscrawler_spark.operators.similarity import semdedup

    dup = [1.0] + [0.0] * 15
    rows = [(i, dup) for i in range(3)] + [
        (10, [0.0] * 15 + [1.0]),
        (11, [0.0, 1.0] + [0.0] * 14),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r for r in semdedup(
            df, n_clusters=1, threshold=0.95, kernel="pandas"
        ).collect()
    }
    kept_dups = [i for i in range(3) if out[i]["kept"]]
    assert kept_dups == [0]
    assert out[10]["kept"] and out[11]["kept"]


def test_semdedup_lloyd_iters_deterministic_and_partition_invariant(
    spark, emb
):
    """Lloyd refinement (iters>0) stays deterministic: same verdicts from a
    1-partition and a 32-partition layout of the same input."""
    from mizzounewscrawler_spark.operators.similarity import semdedup

    one = semdedup(
        emb.repartition(1), n_clusters=8, threshold=0.30, iters=2
    )
    many = semdedup(
        emb.repartition(32), n_clusters=8, threshold=0.30, iters=2
    )
    pa = {r["vec_id"]: (r["cell"], r["kept"]) for r in one.collect()}
    pb = {r["vec_id"]: (r["cell"], r["kept"]) for r in many.collect()}
    assert pa == pb


def test_semdedup_keeps_low_centroid_sim_examples(spark, emb):
    """Within a removed/kept pair above threshold, the kept doc must not be
    preceded (in ascending centroid_sim order) by a >=tau neighbour — spot
    check the ordering semantics on the real fixture."""
    from mizzounewscrawler_spark.operators.similarity import (
        semdedup,
        semdedup_assign,
    )

    out = semdedup(emb, n_clusters=8, threshold=0.30).collect()
    removed = [r for r in out if not r["kept"]]
    assert removed, "fixture must produce removals at tau=0.30"
    # every removed doc has an earlier (lower centroid_sim or equal+lower id)
    # neighbour in the same cell — verify one cell exhaustively in python
    import math

    assign = semdedup_assign(emb, n_clusters=8).collect()
    cell0 = sorted(
        [r for r in assign if r["cell"] == 0],
        key=lambda r: (r["centroid_sim"], r["id"]),
    )
    def cos(u, w):
        d = sum(x * y for x, y in zip(u, w))
        nu = math.sqrt(sum(x * x for x in u))
        nw = math.sqrt(sum(x * x for x in w))
        return round(d / (nu * nw), 6) if nu * nw else 0.0

    verdict = {r["vec_id"]: r["kept"] for r in out}
    for j, rj in enumerate(cell0):
        expect = not any(
            cos(ri["v"], rj["v"]) >= 0.30 for ri in cell0[:j]
        )
        assert verdict[rj["id"]] == expect


def test_semdedup_max_cluster_size_guard(spark, emb):
    """Skew guard: a cap larger than every cluster changes nothing; a small
    cap subsplits deterministically and prunes exactly within sub-cells."""
    from mizzounewscrawler_spark.operators.similarity import (
        semdedup,
        semdedup_assign,
    )

    base = semdedup(emb, n_clusters=8, threshold=0.30)
    capped_noop = semdedup(
        emb, n_clusters=8, threshold=0.30, max_cluster_size=10_000
    )
    pa = {r["vec_id"]: (r["cell"], r["kept"]) for r in base.collect()}
    pb = {r["vec_id"]: (r["cell"], r["kept"]) for r in capped_noop.collect()}
    assert pa == pb

    # small cap: every row still present once, cells unchanged (the output
    # keeps the TRUE cluster id), and the verdict matches a python replay
    # of the documented sub-cell semantics
    import hashlib
    import math

    assign = semdedup_assign(emb, n_clusters=8).collect()
    by_cell: dict[int, list] = {}
    for r in assign:
        by_cell.setdefault(int(r["cell"]), []).append(r)
    sizes = sorted(len(v) for v in by_cell.values())

    def md5_bucket(i) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)

    def cos(u, w):
        d = sum(x * y for x, y in zip(u, w))
        nu = math.sqrt(sum(x * x for x in u))
        nw = math.sqrt(sum(x * x for x in w))
        return round(d / (nu * nw), 6) if nu * nw else 0.0

    def replay(cap):
        expect = {}
        for cell, rows in by_cell.items():
            nsplits = max(1, -(-len(rows) // cap)) if len(rows) > cap else 1
            subs: dict[int, list] = {}
            for r in rows:
                subs.setdefault(md5_bucket(r["id"]) % nsplits, []).append(r)
            for members in subs.values():
                members.sort(key=lambda r: (r["centroid_sim"], r["id"]))
                for j, rj in enumerate(members):
                    expect[rj["id"]] = not any(
                        cos(ri["v"], rj["v"]) >= 0.30 for ri in members[:j]
                    )
        return expect

    # cap=20 splits EVERY cell; the mixed cap leaves some cells plain while
    # cell 0 (if hot) subsplits — the regression case where sub-cell keys
    # colliding with plain cell ids would merge distinct clusters
    mixed_cap = sizes[len(sizes) // 2]  # median size: ~half hot, half plain
    for cap in (20, mixed_cap):
        out = semdedup(
            emb, n_clusters=8, threshold=0.30, max_cluster_size=cap
        ).collect()
        assert len(out) == emb.count()
        assert {r["cell"] for r in out} == set(by_cell)
        got = {r["vec_id"]: r["kept"] for r in out}
        assert got == replay(cap), f"cap={cap}"
    # both kernels agree under the cap too
    out_p = semdedup(
        emb, n_clusters=8, threshold=0.30, max_cluster_size=20,
        kernel="pandas",
    ).collect()
    assert {r["vec_id"]: r["kept"] for r in out_p} == replay(20)


def test_ivf_persisted_index_parity_and_partition_prune(spark, emb, qvec, tmp_path):
    """Build-once/probe-many IVF: probing the persisted index returns
    exactly what the per-query ivf_topk computes (same quantizer, same
    probe order), and a probe against the partitionBy('cell') parquet
    layout partition-prunes the scan."""
    import contextlib
    import io

    from mizzounewscrawler_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_index,
        ivf_topk,
    )

    cents, assigned = ivf_build_index(emb, n_centroids=16)
    direct = [tuple(r) for r in ivf_topk(
        emb, qvec, k=10, n_centroids=16, nprobe=4
    ).collect()]
    via_index = [tuple(r) for r in ivf_probe_index(
        cents, assigned, qvec, k=10, nprobe=4
    ).collect()]
    assert via_index == direct

    # persist partitioned by cell; probe must partition-prune
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("cell").parquet(path)
    persisted = spark.read.parquet(path)
    probe_df = ivf_probe_index(cents, persisted, qvec, k=10, nprobe=4)
    assert [tuple(r) for r in probe_df.collect()] == direct
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe_df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_ivf_incremental_append_matches_full_build(spark, emb, qvec):
    """Assigning a new batch against the frozen centroid table (the
    append path) puts each row in exactly the cell a full rebuild's
    assignment step would — so index appends never change probe
    results vs assigning everything at once."""
    from mizzounewscrawler_spark.operators.similarity import (
        ivf_assign,
        ivf_build_index,
        ivf_probe_index,
    )

    old = emb.where(F.col("vec_id") % 3 != 0)
    new = emb.where(F.col("vec_id") % 3 == 0)
    cents, assigned_old = ivf_build_index(old, n_centroids=16)
    appended = assigned_old.unionByName(ivf_assign(cents, new))
    full_assign = ivf_assign(cents, emb)
    a = {r["vec_id"]: r["cell"] for r in appended.collect()}
    b = {r["vec_id"]: r["cell"] for r in full_assign.collect()}
    assert a == b
    pa = [tuple(r) for r in ivf_probe_index(
        cents, appended, qvec, k=10, nprobe=4
    ).collect()]
    pb = [tuple(r) for r in ivf_probe_index(
        cents, full_assign, qvec, k=10, nprobe=4
    ).collect()]
    assert pa == pb
