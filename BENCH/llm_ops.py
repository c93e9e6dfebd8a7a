"""Scale-stress bench for the LLM-training-data operators (VERDICT r4
next #4): the correctness oracles run at sf0.01 (~600 docs); this runs
the heavy composites at >=10^5 documents on local[32] and reports
per-operator wall time, rows/s, and the job's shuffle read/write bytes
(from Spark's AppStatusStore), so a super-linear runtime curve has
nowhere to hide.

Operators (the round brief's list):
- build_training_corpus WITH the fuzzy (MinHash) pass — gates → exact
  dedup → near-dup pairs/resolve → chunk → pack;
- exact_substring_dedup (sliding 20-token spans);
- semdedup (pandas kernel, ~n/4000 clusters);
- IVF index build + partitioned persist + 10 probes;
- BPE: corpus word histogram → 2000 merges (driver, vocab-sized) →
  distributed encode.

Input: synthetic documents generated IN Spark (mapInPandas, numpy — no
driver-side corpus): ~10% exact dups, ~10% near dups (1-in-37 word
perturbation), a shared 30-word passage in every 7th doc (so the
substring/passage family has real work), plus 64-d clustered embeddings
for the vector family.  Sizes via $LLM_OPS_DOCS (120000) /
$LLM_OPS_VECS (100000).

Usage:  python BENCH/llm_ops.py       # writes BENCH/llm_ops.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from mizzounewscrawler_spark.session import build_session  # noqa: E402

WORDS = np.array(
    (
        "the of and to in a is that for it as was with be by on not he i "
        "this are or his from at which but have an had they you were their "
        "one all we can her has there been if more when will would who so "
        "no out up into them then its about time only could other new some "
        "these two may first any my now such like our over man me even most "
        "made after also did many before must through years where much your "
        "way well down should because each just those people too how little "
        "state good very make world still own see men work long get here "
        "between both life being under never day same another know while "
        "last might us great old year off come since against go came right "
        "used take three"
    ).split()
)
PASSAGE = " ".join(
    f"shared-passage-token-{i}" for i in range(30)
)


def gen_docs(spark, n_docs: int):
    """Deterministic doc table: (doc_id long, text string)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # duplicate structure: id%10==1 copies id-1; id%10==2 is a
            # near-dup of id-2 (every 37th word replaced)
            base = ids.copy()
            base[ids % 10 == 1] -= 1
            near = ids % 10 == 2
            base[near] -= 2
            texts = []
            for b, is_near, i in zip(base, near, ids):
                ln = 120 + int(b % 280)
                pos = np.arange(ln, dtype=np.int64)
                widx = (b * 2654435761 + pos * 97) % len(WORDS)
                ws = WORDS[widx]
                if is_near:
                    ws = ws.copy()
                    ws[::37] = "perturbed"
                t = " ".join(ws)
                if i % 7 == 0:
                    t = t + " " + PASSAGE
                texts.append(t)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (
        spark.range(n_docs)
        .repartition(64)
        .mapInPandas(gen, "doc_id long, text string")
    )


def gen_vecs(spark, n_vecs: int, dim: int = 64, n_clusters: int = 32):
    """Clustered embeddings: (vec_id long, embedding array<double>)."""

    def gen(batches):
        rng_c = np.random.default_rng(11)
        cents = rng_c.normal(size=(n_clusters, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            c = ids % n_clusters
            v = cents[c] + 0.15 * rng.normal(size=(len(ids), dim))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(v.astype("float64"))}
            )

    return (
        spark.range(n_vecs)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def _shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages so
    far, from the internal AppStatusStore; (0, 0) if the py4j surface
    moves."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.Collections.emptyList()
        # Scala default args surface as stageList$default$N accessors
        it = store.stageList(
            empty,
            getattr(store, "stageList$default$2")(),
            getattr(store, "stageList$default$3")(),
            getattr(store, "stageList$default$4")(),
            getattr(store, "stageList$default$5")(),
        ).iterator()
        rd = wr = 0
        while it.hasNext():
            s = it.next()
            rd += s.shuffleReadBytes()
            wr += s.shuffleWriteBytes()
        return rd, wr
    except Exception:  # noqa: BLE001
        return 0, 0


def timed(spark, name: str, rows: int, fn, reps: int = 2) -> dict:
    best, sh = float("inf"), (0, 0)
    for _ in range(reps):
        r0, w0 = _shuffle_totals(spark)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        r1, w1 = _shuffle_totals(spark)
        if dt < best:
            best, sh = dt, (r1 - r0, w1 - w0)
    out = {
        "op": name,
        "rows": rows,
        "sec": round(best, 2),
        "rows_per_sec": round(rows / best, 1),
        "shuffle_read_mb": round(sh[0] / 1e6, 1),
        "shuffle_write_mb": round(sh[1] / 1e6, 1),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    n_docs = int(os.environ.get("LLM_OPS_DOCS", "120000"))
    n_vecs = int(os.environ.get("LLM_OPS_VECS", "100000"))
    reps = int(os.environ.get("LLM_OPS_REPS", "2"))
    spark = build_session(32, shuffle_partitions=64, app_name="llm-ops")
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F

    from mizzounewscrawler_spark.operators.bpe import (
        bpe_encode,
        train_bpe,
        word_histogram,
    )
    from mizzounewscrawler_spark.operators.passages import (
        exact_substring_dedup,
    )
    from mizzounewscrawler_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_index,
        semdedup,
    )
    from mizzounewscrawler_spark.plans.pipeline import build_training_corpus

    docs = gen_docs(spark, n_docs).cache()
    docs.count()
    vecs = gen_vecs(spark, n_vecs).cache()
    vecs.count()
    results = []

    # 1. crawl→corpus composite WITH the fuzzy pass
    arts = docs.select(
        F.col("doc_id").cast("string").alias("url_hash"),
        "text",
        F.lit(None).cast("string").alias("text_clean"),
    )

    def run_corpus():
        # cache_intermediates=True is the materialization contract (the
        # corpus CLI verb sets it): stats fans out into 5 aggregates that
        # would otherwise each recompute the gate->dedup->MinHash->
        # connected-components prefix — measured 5x the wall time here
        out = build_training_corpus(
            arts, min_tokens=20, min_quality=0.0,
            chunk_size=400, chunk_overlap=40, pack_budget=1200,
            neardup=True, cache_intermediates=True,
        )
        out["stats"].collect()

    results.append(timed(spark, "build_training_corpus+fuzzy", n_docs,
                         run_corpus, reps))

    # 2. ExactSubstr sliding-span dedup — both key hashes: md5 is the
    # oracle-pinned default, xxhash64 the scale path (long keys shrink
    # the dominant window-key shuffle ~3x, identical output)
    def run_substr():
        exact_substring_dedup(docs, "text", "doc_id", window=20).agg(
            F.sum("n_removed")
        ).collect()

    results.append(timed(spark, "exact_substring_dedup", n_docs,
                         run_substr, reps))

    def run_substr_xx():
        exact_substring_dedup(
            docs, "text", "doc_id", window=20, key_hash="xxhash64"
        ).agg(F.sum("n_removed")).collect()

    results.append(timed(spark, "exact_substring_dedup(xxhash64)", n_docs,
                         run_substr_xx, reps))

    # 3. SemDeDup, pandas kernel, paper-shaped cluster count
    k = max(8, n_vecs // 4000)

    def run_semdedup():
        semdedup(
            vecs, n_clusters=k, threshold=0.3, kernel="pandas"
        ).agg(F.sum(F.col("kept").cast("int"))).collect()

    results.append(timed(spark, f"semdedup(k={k},pandas)", n_vecs,
                         run_semdedup, reps))

    # 4. IVF: build + persist partitioned + probe x10
    idx_dir = os.path.join(HERE, "_llm_ops_ivf")

    def run_ivf_build():
        cents, assigned = ivf_build_index(vecs, n_centroids=64)
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(idx_dir, "assigned")
        )
        cents.write.mode("overwrite").parquet(
            os.path.join(idx_dir, "centroids")
        )

    results.append(timed(spark, "ivf_build_index+persist", n_vecs,
                         run_ivf_build, 1))

    cents_df = spark.read.parquet(os.path.join(idx_dir, "centroids"))
    assigned_df = spark.read.parquet(os.path.join(idx_dir, "assigned"))
    rng = np.random.default_rng(5)
    queries = rng.normal(size=(10, 64)).tolist()

    def run_ivf_probe():
        for q in queries:
            ivf_probe_index(
                cents_df, assigned_df, q, k=10, nprobe=4
            ).collect()

    probe_row = timed(spark, "ivf_probe_index x10", n_vecs * 10 // 16,
                      run_ivf_probe, reps)
    probe_row["note"] = "rows = 10 probes x nprobe/ncentroids of corpus"
    results.append(probe_row)

    # 5. BPE train (histogram + driver merges) and distributed encode
    merges_holder = {}

    def run_bpe_train():
        hist = [
            (r["word"], r["n"])
            for r in word_histogram(docs, "text").collect()
        ]
        merges_holder["m"] = train_bpe(hist, num_merges=2000)

    results.append(timed(spark, "bpe_train(2000 merges)", n_docs,
                         run_bpe_train, 1))

    def run_bpe_encode():
        bpe_encode(docs, "text", merges_holder["m"]).agg(
            F.sum(F.size("bpe_tokens"))
        ).collect()

    results.append(timed(spark, "bpe_encode", n_docs, run_bpe_encode, reps))

    out = {
        "bench": "LLM-ops scale stress, local[32]",
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "reps": reps,
        "ops": results,
    }
    with open(os.path.join(HERE, "llm_ops.json"), "w") as f:
        json.dump(out, f, indent=1)
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps({"written": "BENCH/llm_ops.json"}))


if __name__ == "__main__":
    main()
