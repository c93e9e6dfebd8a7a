"""U8: LLM article enrichment — provider-routed summarization (seam).

Reference surface (out-of-parity-scope per SURVEY §2.10; re-expressed here
as a first-class seam the same way U4–U6 model stubs are):

- ``src/services/llm/article_pipeline.py:22-32`` — the newsroom summary
  prompt template; ``:108-127`` renders it per article with the body
  truncated at 4000 chars (+ ``"\\n..."``), title/author defaulted, and the
  publish date ISO-formatted.
- ``src/services/llm/orchestrator.py:96-155`` — SEQUENTIAL provider
  fallback: each unavailable/failing provider appends a typed failure
  (``configuration`` / ``rate_limit`` / ``provider``) and the next provider
  is tried; the first success wins and carries its provider name.
- ``src/services/llm/article_pipeline.py:58-93,129-148`` — articles are
  selected by status + recency + limit, and the result (summary, provider,
  failures, timestamp) is persisted onto the article record.

Spark-first design:

- :func:`render_prompt_expr` is a pure column expression (JVM, codegen —
  no Python in the hot path) mirroring ``_render_prompt``.
- :func:`summarize_expr` is the DETERMINISTIC fake backend: a 3-sentence
  extractive summary (the reference prompt asks for exactly three
  sentences), expressed as split/slice/join column ops so the catalog
  entry has an exact DuckDB SQL mirror.
- :func:`enrich_articles` is the operator: with no providers it stamps the
  JVM fake; with a provider chain it runs ONE ``mapInPandas`` pass whose
  batch loop applies the reference's sequential fallback VECTORIZED — each
  provider gets the still-unsummarized slice of the batch (Arrow-batched,
  executor-side; a real HTTP provider plugs in as a callable holding an
  executor-singleton client, the `operators/ml.py` pattern).  Per-row typed
  failures are returned as an array of structs, matching the reference's
  ``ProviderFailure`` records.

At 100 TB the enrichment pass is embarrassingly parallel (per-article, no
shuffle); the only scale knobs are the Arrow batch size (provider request
batching) and partition count.  Rate limits are per-provider-per-executor,
which is exactly how the reference's per-process providers behave on a pod
fleet.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference article_pipeline.py:22-32 (public prompt template, transcribed)
DEFAULT_PROMPT_TEMPLATE = (
    "You are assisting a newsroom by producing a concise summary of "
    "the following article. Provide a three sentence summary focusing on "
    "the who, what, where, and why. Include any key impacts on the "
    "community and note if the story highlights civic issues.\n\n"
    "Title: {title}\n"
    "Author: {author}\n"
    "Published: {published}\n"
    "URL: {url}\n\n"
    "Article Body:\n{content}\n"
)

MAX_PROMPT_BODY_CHARS = 4000  # reference article_pipeline.py:111
SUMMARY_SENTENCES = 3  # the template mandates a three sentence summary


def render_prompt_expr(
    title: Column,
    author: Column,
    publish_date: Column,
    url: Column,
    text: Column,
    max_chars: int = MAX_PROMPT_BODY_CHARS,
) -> Column:
    """The reference's ``_render_prompt`` as one JVM expression
    (article_pipeline.py:108-127): body trimmed then truncated at
    ``max_chars`` with a ``\\n...`` marker, title defaulted to
    ``(untitled)``, author to ``unknown``, date ISO-formatted or
    ``unknown``."""
    body = F.trim(F.coalesce(text, F.lit("")))
    body = F.when(
        F.length(body) > max_chars,
        F.concat(F.substring(body, 1, max_chars), F.lit("\n...")),
    ).otherwise(body)
    published = F.coalesce(
        F.date_format(publish_date, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("unknown")
    )
    # format_string mirrors str.format for the fixed template field order
    template = (
        DEFAULT_PROMPT_TEMPLATE.replace("%", "%%")
        .replace("{title}", "%s")
        .replace("{author}", "%s")
        .replace("{published}", "%s")
        .replace("{url}", "%s")
        .replace("{content}", "%s")
    )
    return F.format_string(
        template,
        F.coalesce(F.nullif(F.trim(title), F.lit("")), F.lit("(untitled)")),
        F.coalesce(F.nullif(F.trim(author), F.lit("")), F.lit("unknown")),
        published,
        F.coalesce(url, F.lit("")),
        body,
    )


def summarize_expr(text: Column, n_sentences: int = SUMMARY_SENTENCES) -> Column:
    """Deterministic extractive fake: the first ``n_sentences`` sentences
    of the body, sentence-split on ``". "`` — the sanctioned stand-in for a
    real provider (same policy as the U4/U5 model stubs), chosen to be
    EXACTLY SQL-mirrorable:

        array_to_string(list_slice(string_split(text, '. '), 1, 3), '. ')

    so the catalog entry has a DuckDB oracle."""
    return F.array_join(
        F.slice(F.split(F.coalesce(text, F.lit("")), "\\. "), 1, n_sentences),
        ". ",
    )


FAKE_PROVIDER_NAME = "extractive-fake"

FAILURE_SCHEMA = "array<struct<provider:string,reason:string,error_type:string>>"


@dataclass
class BatchProvider:
    """One provider in the fallback chain.

    ``generate`` maps a pandas Series of prompts to a same-length Series of
    summaries; rows it cannot serve are returned as ``None`` (→ typed
    ``provider`` failures, next provider tries them).  ``available=False``
    mirrors an unconfigured provider (orchestrator.py:104-112: a
    ``configuration`` failure for every row, chain continues).  Raising
    from ``generate`` marks the WHOLE batch failed with ``error_type=
    provider`` (rate-limit style errors raise ``RateLimited``)."""

    name: str
    generate: Callable[[pd.Series], pd.Series]
    available: bool = True


class RateLimited(Exception):
    """Provider signalled a rate limit (orchestrator.py:122-129)."""


def fake_provider(name: str = FAKE_PROVIDER_NAME) -> BatchProvider:
    """The deterministic extractive backend as a chain provider (pandas
    twin of :func:`summarize_expr`, for tests and chain composition)."""

    def gen(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(
            lambda t: ". ".join(t.split(". ")[:SUMMARY_SENTENCES])
        )

    return BatchProvider(name=name, generate=gen)


def _apply_chain(
    texts: pd.Series, providers: list[BatchProvider]
) -> tuple[pd.Series, pd.Series, pd.Series]:
    """Vectorized sequential fallback over one Arrow batch: each provider
    sees only the rows every earlier provider failed (reference
    orchestrator.py:96-155, batch form)."""
    summary = pd.Series([None] * len(texts), index=texts.index, dtype=object)
    provider = pd.Series([None] * len(texts), index=texts.index, dtype=object)
    failures: pd.Series = pd.Series(
        [[] for _ in range(len(texts))], index=texts.index, dtype=object
    )
    pending = texts.index
    for p in providers:
        if len(pending) == 0:
            break
        def fail(reason: str, error_type: str, idx) -> None:
            rec = {"provider": p.name, "reason": reason, "error_type": error_type}
            for i in idx:
                failures[i] = failures[i] + [rec]

        if not p.available:
            fail("provider not configured", "configuration", pending)
            continue
        try:
            out = p.generate(texts.loc[pending])
        except RateLimited as exc:
            fail(str(exc), "rate_limit", pending)
            continue
        except Exception as exc:  # noqa: BLE001 — typed into the record
            fail(str(exc), "provider", pending)
            continue
        got = out.notna()
        for i in pending[got.to_numpy()]:
            summary[i] = out[i]
            provider[i] = p.name
        fail("no content", "provider", pending[(~got).to_numpy()])
        pending = pending[(~got).to_numpy()]
    return summary, provider, failures


def enrich_articles(
    articles: DataFrame,
    providers: list[BatchProvider] | None = None,
    statuses: Iterable[str] | None = None,
    limit: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """U8 operator: select articles (status filter + recency order + limit,
    reference article_pipeline.py:95-106) and stamp ``llm_summary`` /
    ``llm_provider`` / ``llm_failures``.

    With ``providers=None`` the deterministic JVM fake runs — zero Python,
    whole-stage codegen.  With a chain, one ``mapInPandas`` pass applies
    the sequential fallback per Arrow batch."""
    df = articles
    if statuses is not None:
        df = df.where(F.col("status").isin(list(statuses)))
    if limit is not None:
        order = [
            c for c in ("wave", "publish_date", "url_hash") if c in df.columns
        ]
        if not order:
            raise ValueError(
                "enrich_articles(limit=...) needs a recency/tiebreak column "
                "(one of wave/publish_date/url_hash) so the selected subset "
                "is deterministic; add one or drop the limit"
            )
        df = df.orderBy(*[F.col(c).desc() for c in order]).limit(int(limit))
    if not providers:
        return (
            df.withColumn("llm_summary", summarize_expr(F.col(text_col)))
            .withColumn("llm_provider", F.lit(FAKE_PROVIDER_NAME))
            .withColumn("llm_failures", F.lit(None).cast(FAILURE_SCHEMA))
        )

    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    failure_type = ArrayType(
        StructType(
            [
                StructField("provider", StringType()),
                StructField("reason", StringType()),
                StructField("error_type", StringType()),
            ]
        )
    )
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("llm_summary", StringType()),
            StructField("llm_provider", StringType()),
            StructField("llm_failures", failure_type),
        ]
    )
    cols = list(df.columns)

    def run(batches):
        for b in batches:
            s, p, f = _apply_chain(b[text_col], providers)
            b = b.copy()
            b["llm_summary"] = s
            b["llm_provider"] = p
            b["llm_failures"] = f
            yield b

    return df.mapInPandas(run, out_schema).select(
        *cols, "llm_summary", "llm_provider", "llm_failures"
    )
