"""U8 LLM enrichment seam (reference src/services/llm/orchestrator.py:96-155,
article_pipeline.py:58-148): prompt rendering, the deterministic extractive
backend, and sequential provider fallback with typed failure records."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mizzounewscrawler_spark.operators.enrichment import (
    DEFAULT_PROMPT_TEMPLATE,
    FAKE_PROVIDER_NAME,
    MAX_PROMPT_BODY_CHARS,
    BatchProvider,
    RateLimited,
    enrich_articles,
    fake_provider,
    render_prompt_expr,
    summarize_expr,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "title", "author", "text"])
    )


def test_render_prompt_matches_reference_format(spark):
    df = _docs(
        spark,
        [
            ("http://a/x", "Big News", "Jo Doe", "Body text."),
            ("http://a/y", None, None, "  padded  "),
            ("http://a/z", "Long", "A", "z" * (MAX_PROMPT_BODY_CHARS + 50)),
        ],
    ).withColumn("publish_date", F.lit(None).cast("timestamp"))
    out = {
        r["url"]: r["p"]
        for r in df.select(
            "url",
            render_prompt_expr(
                F.col("title"),
                F.col("author"),
                F.col("publish_date"),
                F.col("url"),
                F.col("text"),
            ).alias("p"),
        ).collect()
    }
    # python twin of article_pipeline._render_prompt (reference :108-127)
    assert out["http://a/x"] == DEFAULT_PROMPT_TEMPLATE.format(
        title="Big News",
        author="Jo Doe",
        published="unknown",
        url="http://a/x",
        content="Body text.",
    )
    # null title/author default; body trimmed
    assert "Title: (untitled)\n" in out["http://a/y"]
    assert "Author: unknown\n" in out["http://a/y"]
    assert "Article Body:\npadded\n" in out["http://a/y"]
    # truncation at 4000 chars with the \n... marker
    assert out["http://a/z"].endswith("z" * 10 + "\n...\n")
    assert ("z" * (MAX_PROMPT_BODY_CHARS + 1)) not in out["http://a/z"]


def test_summarize_expr_matches_pandas_twin(spark):
    texts = [
        "One. Two. Three. Four. Five.",
        "Only one sentence",
        "",
        "A. B",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r["s"] for r in df.select(summarize_expr(F.col("text")).alias("s")).collect()]
    twin = fake_provider().generate(pd.Series(texts)).tolist()
    assert got == twin
    assert got[0] == "One. Two. Three"


def test_enrich_without_providers_is_jvm_only(spark):
    df = _docs(spark, [("u1", "T", "A", "S1. S2. S3. S4.")]).withColumn(
        "status", F.lit("extracted")
    )
    out = enrich_articles(df, providers=None).collect()[0]
    assert out["llm_summary"] == "S1. S2. S3"
    assert out["llm_provider"] == FAKE_PROVIDER_NAME
    assert out["llm_failures"] is None
    plan = enrich_articles(df, providers=None)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan  # zero Python in the default path


def test_provider_fallback_records_typed_failures(spark):
    # chain: unconfigured -> rate-limited -> partial -> fake
    def boom(_texts):
        raise RateLimited("quota exhausted")

    def partial(texts):
        # serves only short texts; longer rows fall through to the fake
        return texts.map(lambda t: t.upper() if len(t) < 10 else None)

    chain = [
        BatchProvider("unconfigured", lambda s: s, available=False),
        BatchProvider("limited", boom),
        BatchProvider("partial", partial),
        fake_provider(),
    ]
    df = _docs(
        spark,
        [
            ("u1", "T", "A", "short. x"),
            ("u2", "T", "A", "much longer body. with sentences. three. four."),
        ],
    )
    rows = {r["url"]: r for r in enrich_articles(df, providers=chain).collect()}
    assert rows["u1"]["llm_provider"] == "partial"
    assert rows["u1"]["llm_summary"] == "SHORT. X"
    assert rows["u2"]["llm_provider"] == FAKE_PROVIDER_NAME
    assert rows["u2"]["llm_summary"] == "much longer body. with sentences. three"
    # every row carries the configuration + rate_limit failures in order
    for r in rows.values():
        kinds = [(f["provider"], f["error_type"]) for f in r["llm_failures"]]
        assert kinds[:2] == [
            ("unconfigured", "configuration"),
            ("limited", "rate_limit"),
        ]
    assert ("partial", "provider") in [
        (f["provider"], f["error_type"]) for f in rows["u2"]["llm_failures"]
    ]


def test_all_providers_exhausted_leaves_nulls(spark):
    chain = [BatchProvider("down", lambda s: s, available=False)]
    df = _docs(spark, [("u1", "T", "A", "x. y. z.")])
    r = enrich_articles(df, providers=chain).collect()[0]
    assert r["llm_summary"] is None and r["llm_provider"] is None
    assert [f["error_type"] for f in r["llm_failures"]] == ["configuration"]


def test_status_filter_and_limit(spark):
    rows = [
        ("u%d" % i, "T", "A", "body. one. two.") for i in range(6)
    ]
    df = _docs(spark, rows).withColumn(
        "status",
        F.when(F.col("url").isin("u0", "u1", "u2"), "extracted").otherwise("failed"),
    ).withColumn("wave", F.monotonically_increasing_id())
    out = enrich_articles(df, statuses=["extracted"], limit=2)
    got = out.collect()
    assert len(got) == 2
    assert all(r["status"] == "extracted" for r in got)
