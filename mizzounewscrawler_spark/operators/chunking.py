"""Document chunking: split corpus text into overlapping training windows.

The last pre-tokenizer step of an LLM data pipeline: each document becomes
ceil(max(len - overlap, 1) / stride) fixed-size windows with ``overlap``
chars of context carried across boundaries.  Chunking is a pure per-row
explode — no shuffle, no state, no Python:

    starts  = sequence(0, len-1, stride)        (JVM, codegen)
    chunks  = transform(starts, s -> substring(text, s+1, size))
    posexplode(chunks)

so at 100 TB it rides the scan stage and its cost is exactly the output
volume (≈ len/stride × size bytes per doc ≈ a size/stride expansion
factor).  Per-task memory is bounded by one document's chunk array —
``spark.sql.files.maxPartitionBytes`` sizing is unchanged.  Chunks are
char-addressed (byte-deterministic, tokenizer-agnostic); token-exact
windows belong downstream of the tokenizer, which is a model artifact,
not an engine operator.

Chunk identity: (doc_id, chunk_id) with chunk_id = start div stride —
derivable from the chunk alone, stable under any partitioning, and
identical in the SQL mirror (both engines enumerate the same integer
start sequence).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    size: int,
    overlap: int = 0,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each row into overlapping ``size``-char windows.

    Returns ``id_cols`` (default: every non-text column) plus
    ``chunk_id`` (0-based, = start div stride), ``chunk_start`` (0-based
    char offset) and ``chunk`` (the window text, shorter than ``size``
    only at the tail).  Rows with empty/whitespace-only text produce no
    chunks.  ``overlap`` must be < ``size`` so the stride is positive.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    ids = id_cols if id_cols is not None else [
        c for c in df.columns if c != text_col
    ]
    text = F.col(text_col)
    # a chunk starting at s contributes new characters iff s < len - overlap
    # (otherwise it is fully contained in the previous window — emitting it
    # would duplicate its chars in the corpus), so starts stop there; the
    # greatest() keeps [0] for texts shorter than the overlap
    starts: Column = F.sequence(
        F.lit(0),
        F.greatest(F.length(text) - F.lit(overlap + 1), F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.substring(text, s + F.lit(1), size)
    )
    return (
        df.where(F.trim(text) != "")
        .select(*ids, F.posexplode(chunks).alias("_pos", "chunk"))
        .select(
            *ids,
            F.col("_pos").alias("chunk_id"),
            (F.col("_pos") * F.lit(stride)).alias("chunk_start"),
            "chunk",
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 64,
    bucket_of: Column | None = None,
) -> DataFrame:
    """Pack items (chunks/documents) into training sequences of total
    ``weight_col`` ≤ ``budget`` — next-fit greedy in ``id_col`` order
    within hash buckets.

    Packing is inherently sequential, so determinism and parallelism are
    reconciled the same way as every keyed operator here: the unit of
    sequential work is a DATA-DERIVED bucket (``pmod(xxhash64(id),
    n_buckets)``), not a physical partition — the output is identical at
    local[2] and on 1000 executors.  One shuffle on the uniform bucket
    key; per-bucket state is O(1) (next-fit keeps only the open
    sequence, single pass over the bucket's items in id order).  Next-fit
    wastes at most one item's slack per boundary vs bin-packing optimal —
    the right trade at 10^10 items, where optimality is NP-hard and
    irrelevant.

    Items heavier than ``budget`` get a singleton sequence with
    ``oversize = true`` (downstream truncates at the tokenizer); nothing
    is dropped.  Returns one row per packed sequence: ``(bucket, seq_id,
    n_items, total_weight, item_ids, oversize)`` with ``seq_id`` 0-based
    within the bucket.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    if bucket_of is None:
        # default: uniform data-derived bucket (override with any
        # deterministic expression, e.g. a mirrorable pmod on an int id)
        bucket_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    bucketed = df.select(
        bucket_of.cast("int").alias("bucket"),
        F.col(id_col).alias("_id"),
        F.col(weight_col).cast("long").alias("_w"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", ignore_index=True)
        out: list[dict] = []
        cur_ids: list = []
        cur_w = 0

        def flush():
            if cur_ids:
                out.append(
                    {
                        "bucket": int(pdf["bucket"].iloc[0]),
                        "seq_id": len(out),
                        "n_items": len(cur_ids),
                        "total_weight": cur_w,
                        "item_ids": list(cur_ids),
                        "oversize": cur_w > budget,
                    }
                )

        for _id, w in zip(pdf["_id"], pdf["_w"]):
            w = int(w)
            if w > budget:  # singleton, flagged
                flush()
                cur_ids, cur_w = [_id], w
                flush()
                cur_ids, cur_w = [], 0
                continue
            if cur_w + w > budget:
                flush()
                cur_ids, cur_w = [], 0
            cur_ids.append(_id)
            cur_w += w
        flush()
        cols = ["bucket", "seq_id", "n_items", "total_weight", "item_ids",
                "oversize"]
        return pd.DataFrame(out, columns=cols)

    schema = (
        f"bucket int, seq_id int, n_items int, total_weight long, "
        f"item_ids array<{id_type}>, oversize boolean"
    )
    return bucketed.groupBy("bucket").applyInPandas(pack, schema)
