"""Link-graph analytics: fixed-point PageRank for host authority.

A frontier at 10^10 URLs wants link-based host authority as a scheduling
prior (which the reference approximates with hand-set source priorities —
/root/reference/src/crawler/discovery.py source ordering); PageRank over
the discovered host→host link graph is the principled version.

Two scale/determinism choices:

* **Per-iteration plan**: contributions = edges ⋈ ranks on src (shuffle on
  the uniform src key) → groupBy dst (map-side combinable sum) → left join
  back to the node set.  O(|E| + |V|) per iteration, ``localCheckpoint``
  truncates lineage between iterations — the same recipe as
  ``dedup.connected_components``.
* **Fixed-point integer arithmetic** (rank scaled by 10^6, damping 85/100,
  integer division): floating-point PageRank is sum-order-dependent, so a
  distributed run and a sequential oracle can disagree in the last ulp and
  cascade across iterations.  All-integer updates are bit-exact regardless
  of partitioning — which is what lets the catalog entry carry a full
  value-hash DuckDB oracle (unrolled-CTE iterations).

Dangling nodes keep the teleport term only (their mass is not
redistributed — the "no self-loop patch" PageRank variant; fine for a
scheduling prior and stated so both engines agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank → ``(id, rank)`` with rank scaled by 10^6.

    ``edges`` must be distinct (src, dst) pairs; self-loops are dropped.
    Update rule (all integer, positive, so floor division is trunc in
    every engine):

        contrib(e)  = rank[src] div outdeg[src]
        rank'[v]    = (1-d)·SCALE + (d_num · Σ contrib) div d_den
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ew = e.join(outdeg, "src")
    teleport = (SCALE * (damping_den - damping_num)) // damping_den
    ranks = nodes.select("id", F.lit(SCALE).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["id"])
            .select("dst", F.expr("r div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_num} * coalesce(s, 0)) div {damping_den}")
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.col("r").alias("rank"))
