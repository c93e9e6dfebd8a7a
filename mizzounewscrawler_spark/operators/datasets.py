"""S1 dataset scoping: crawls and reports restricted to a named dataset.

The reference scopes work to named datasets through a ``datasets`` /
``dataset_sources`` M:N (/root/reference/src/models/__init__.py:542-580,
664-698) and a ``dataset_label`` filter inside ``get_sources_to_process``
(/root/reference/src/crawler/discovery.py:2071-2326).  Here the M:N is a
dimension-sized DataFrame ``(dataset_label, source_id)`` and scoping is one
broadcast semi-join applied to the seeds — everything downstream
(seed_frontier, allowed_hosts, host dims, build_wave, county_report) is
then scoped for free, because every stage derives from the seed set.

Scale note: dataset membership is #sources-sized (thousands), never
fact-sized — always broadcast, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_members(dataset_sources: DataFrame, dataset_label: str) -> DataFrame:
    """The ``source_id`` members of one named dataset."""
    return dataset_sources.where(
        F.col("dataset_label") == dataset_label
    ).select("source_id")


def scope_sources(
    seeds: DataFrame, dataset_sources: DataFrame, dataset_label: str
) -> DataFrame:
    """Seeds restricted to the named dataset — the engine's analog of the
    reference's ``dataset_label`` filter in ``get_sources_to_process``.

    ``dataset_sources``: (dataset_label, source_id) M:N rows.  A broadcast
    left-semi join: the M:N is dimension-sized by construction."""
    return seeds.join(
        F.broadcast(dataset_members(dataset_sources, dataset_label)),
        on="source_id",
        how="left_semi",
    )
