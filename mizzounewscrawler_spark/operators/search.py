"""Set-containment join — boolean AND keyword search over the corpus.

``containment_join`` returns every (query, document) pair where the
query's token set is a SUBSET of the document's token set: the relational
core of "find all documents containing ALL of these terms" (decontamination
lookups, boolean retrieval, tag-subset matching).

Plan (LCJoin, ICDE 2019, is the inverted-list state of the art; this is
the DataFrame re-expression of its crosscutting idea — probe the shortest
list, verify the rest):

1. build the doc-frequency table of the corpus' distinct tokens (two
   map-side-combinable groupBys, uniform token keys);
2. PREFIX FILTER: each query selects its globally RAREST token
   (min doc-frequency, token as tie-break — deterministic), and only that
   one token is used as the inverted-index join key.  Candidates per query
   = df(rarest token), the minimum any single-key plan can touch; a hot
   boilerplate token is never a join key unless a query consists solely of
   hot tokens.
3. exact verify JVM-side: ``forall(q_tokens, t -> array_contains(...))``
   over the candidate pairs — whole-stage-codegen, no Python.

A query containing a token absent from the corpus joins nothing (df NULL
sorts first and the posting join finds no rows) — correct: no document can
contain it.

Scale: the only shuffles are token-keyed groupBys and the rarest-token
equi-join; no all-pairs anywhere.  At 10^10 docs the posting/df tables are
the corpus' token index — build once, reuse across query batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def containment_join(
    docs: DataFrame,
    queries: DataFrame,
    doc_id: str = "doc_id",
    doc_tokens: str = "tokens",
    q_id: str = "q_id",
    q_tokens: str = "q_tokens",
) -> DataFrame:
    """(q_id, doc_id) pairs with set(q_tokens) ⊆ set(doc_tokens).

    Token columns are ``array<string>``; comparison is exact (callers
    normalize case upstream).  Empty query token sets match every document
    (vacuous containment) via a crossJoin-free broadcast of the empty
    queries' ids — they are rare by construction.
    """
    d = docs.select(F.col(doc_id).alias("_d"), F.col(doc_tokens).alias("_dt"))
    q = queries.select(F.col(q_id).alias("_q"), F.col(q_tokens).alias("_qt"))

    posting = d.select(
        "_d", F.explode(F.array_distinct("_dt")).alias("_tok")
    )
    dfreq = posting.groupBy("_tok").agg(F.count("*").alias("_df"))

    qtok = q.select("_q", F.explode(F.array_distinct("_qt")).alias("_tok"))
    ranked = qtok.join(dfreq, "_tok", "left").withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_q").orderBy(
                F.col("_df").asc_nulls_first(), F.col("_tok").asc()
            )
        ),
    )
    rarest = ranked.where(F.col("_rn") == 1).select("_q", "_tok")

    cand = rarest.join(posting, "_tok").select("_q", "_d")
    verified = (
        cand.join(q, "_q")
        .join(d, "_d")
        .where(
            F.forall("_qt", lambda t: F.array_contains(F.col("_dt"), t))
        )
        .select(F.col("_q").alias(q_id), F.col("_d").alias(doc_id))
    )

    empties = q.where(F.size("_qt") == 0).select("_q")
    if empties.isEmpty():
        return verified
    vacuous = d.select("_d").crossJoin(F.broadcast(empties)).select(
        F.col("_q").alias(q_id), F.col("_d").alias(doc_id)
    )
    return verified.unionByName(vacuous)
