"""Fetch + extraction as Arrow-vectorized dataflow.

The reference's fetch/extract loop is sequential per row with per-domain
sleeps (/root/reference/src/cli/commands/extraction.py:1203-1265); here the
"fetch" is a join of the wave against the ``pages`` table (sandbox stand-in
for HTTP per ``input_hint``), and extraction is ``mapInPandas`` over
(url, html) batches — the per-URL extraction "query" U1
(/root/reference/src/mcmetadata/__init__.py:52-291) re-expressed as one
struct-producing vectorized stage.

Status cascade after extraction (column expressions, not Python):
- challenge page            → 'proxy_blocked'  (reference extraction.py:1273-1312)
- wire byline               → 'wire'           (stage-2 byline patterns, extraction.py:1344-1502)
- text < 150 chars          → 'paywall'        (MIN_CONTENT_LENGTH gate, extraction.py:1518)
- otherwise                 → 'extracted'
Stage order matters for parity (SURVEY.md §2.8 C17) and matches the
reference: challenge is detected before wire, wire before the length gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mizzounewscrawler_spark.functions.exprcache import session_memo
from mizzounewscrawler_spark.functions.html import (
    extract_author,
    extract_links,
    extract_publish_date,
    extract_structured,
    extract_text_cascade,
    extract_title,
    fresh_feed_links,
    is_challenge_page,
)
from mizzounewscrawler_spark.functions.titles import merge_title

# wire byline panel (reference wire_services table seeds, pattern_type='byline')
WIRE_AUTHOR_RE = r"(?i)^(the\s+)?(associated press|ap|reuters|afp|cnn newsource)\b"

_COLS = (
    "url", "found", "text", "title", "author", "method", "is_challenge",
    "links", "is_feed", "publish_date", "sd_provider", "sd_is_wire",
    "field_methods",
)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("found", T.BooleanType()),
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("is_challenge", T.BooleanType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("is_feed", T.BooleanType()),
        # C9: JSON-LD/meta publish date, parsed + future-guarded (pinned clock)
        T.StructField("publish_date", T.TimestampType()),
        # C11/C17 stage 1: structured-data wire signals
        T.StructField("sd_provider", T.StringType()),
        T.StructField("sd_is_wire", T.BooleanType()),
        # U3: which extraction method supplied each merged field (the
        # reference's extraction_methods tracking dict, __init__.py:2036)
        T.StructField(
            "field_methods", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)


def _extract_batch(
    pdf: pd.DataFrame, use_trafilatura: bool = False
) -> pd.DataFrame:
    out = {k: [] for k in _COLS}
    for url, html in zip(pdf["url"], pdf["html"]):
        out["url"].append(url)
        if html is None:
            for k in ("text", "title", "author", "method", "publish_date"):
                out[k].append(None)
            out["found"].append(False)
            out["is_challenge"].append(False)
            out["links"].append([])
            out["is_feed"].append(False)
            out["sd_provider"].append("")
            out["sd_is_wire"].append(False)
            out["field_methods"].append({})
            continue
        doc = bytes(html).decode("utf-8", errors="replace")
        is_feed = doc.lstrip().startswith("<?xml") or "<rss" in doc[:200]
        if is_feed:
            # F6 recency at discovery time: stale feed entries never become
            # candidates (reference discovery.py:1951-1956)
            links = fresh_feed_links(doc)
            text, method, title, author, challenge = "", "feed", "", "", False
            pub, sd, fmeth = None, {"provider": "", "is_wire": False}, {}
        else:
            text, method = extract_text_cascade(
                doc, use_trafilatura=use_trafilatura
            )
            sd = extract_structured(doc, url=url or "")
            # U3 per-field ordered coalesce across extraction methods, with
            # per-field method tracking (reference _merge_extraction_results,
            # __init__.py:2012-2060); C7 strips site suffixes from the title
            title, title_method = merge_title(sd.get("title"), extract_title(doc))
            meta_author = extract_author(doc)
            author = meta_author or sd["author"]
            author_method = (
                "meta_tag" if meta_author
                else ("structured_data" if sd["author"] else "none")
            )
            pub = extract_publish_date(doc, sd)
            date_method = (
                "structured_data" if sd.get("date")
                else ("time_tag" if pub is not None else "none")
            )
            fmeth = {
                "text": method,
                "title": title_method,
                "author": author_method,
                "publish_date": date_method,
            }
            challenge = is_challenge_page(doc)
            links = extract_links(doc, url)
        out["field_methods"].append(fmeth)
        out["found"].append(True)
        out["text"].append(text)
        out["title"].append(title)
        out["author"].append(author)
        out["method"].append(method)
        out["is_challenge"].append(challenge)
        out["links"].append(links)
        out["is_feed"].append(is_feed)
        out["publish_date"].append(pub)
        out["sd_provider"].append(sd["provider"])
        out["sd_is_wire"].append(bool(sd["is_wire"]))
    return pd.DataFrame(out)


def fetch_and_extract(
    wave: DataFrame,
    pages: DataFrame,
    keep_html_hosts: "frozenset[str] | set[str] | None" = None,
    use_trafilatura: bool = False,
) -> DataFrame:
    """Join the wave against ``pages`` ("fetch") and extract.

    The join key is the **canonical SURT**, not the raw URL: a frontier row
    discovered via a tracking-param variant (`…?utm_source=…`) must fetch
    the same resource as the canonical URL — the reference fetches by
    normalized URL (mcmetadata/urls.py:290-344).  The page store's surt is
    computed on the fly (a JVM regex over the url column — cheap next to
    the html bytes).  Requirement: the store must be canonical-unique (at
    most one row per surt — true of a deduplicated Common-Crawl-style
    capture); a duplicate surt would fan a frontier row out into duplicate
    results.  The fixture generator guarantees this and the parity suite
    asserts it.

    The wave is politeness-bounded (≤ max_per_host × #hosts) — tiny relative
    to the page store — so the fetch is a **broadcast-wave inner join**: the
    page table streams once with a hash probe and its html blobs are never
    shuffled.  Missing pages (the HTTP-404 analog) are recovered by probing
    the page store's **surt column only** (a second, column-pruned scan that
    never touches html) and broadcast-anti-joining the wave against it — no
    wave-sized html ever needs caching (r1 shape cached the joined html,
    ~wave × page-size heap per wave).  A naive ``wave.join(pages, …,
    "left")`` would sort-merge-shuffle the whole page store every wave — the
    100 TB anti-pattern.
    """
    from mizzounewscrawler_spark.functions.urls import surt_expr

    # prefer a precomputed url_surt column (the production store carries
    # the canonical key — Iceberg would bucket on it); computing it on the
    # fly is ~10 chained JVM regexes per url per scan, a real per-wave tax
    # on large stores
    if "url_surt" in pages.columns:
        pages_k = pages.select("url_surt", "html").where(
            F.col("url_surt").isNotNull()
        )
    else:
        pages_k = pages.select(
            surt_expr(F.col("url")).alias("url_surt"), "html"
        ).where(F.col("url_surt").isNotNull())
    inner = pages_k.join(F.broadcast(wave), on="url_surt", how="inner")
    # the semi probe broadcasts the SAME wave plan (not a projected copy):
    # Catalyst reuses the one broadcast exchange instead of building two —
    # per-wave broadcast builds are driver latency that never shrinks with
    # cluster size
    matched = pages_k.select("url_surt").join(
        F.broadcast(wave), on="url_surt", how="left_semi"
    )
    missing = wave.join(
        F.broadcast(matched), on="url_surt", how="left_anti"
    ).withColumn("html", F.lit(None).cast("binary"))
    fetched = inner.select(*wave.columns, "html").unionByName(
        missing.select(*wave.columns, "html")
    )

    keep_set = frozenset(keep_html_hosts) if keep_html_hosts else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = _extract_batch(
                pdf[["url", "html"]], use_trafilatura=use_trafilatura
            )
            if keep_set is not None:
                # S6 passthrough: raw html survives extraction ONLY for
                # proxy-pattern-flagged hosts (a dimension) — the column is
                # NULL everywhere else, so the Arrow return path stays
                # wave-metadata-sized
                res["html_kept"] = pdf["html"].where(
                    pdf["host"].isin(keep_set), None
                ).reset_index(drop=True)
            carried = pdf.drop(columns=["html", "url"])
            yield pd.concat(
                [res.reset_index(drop=True), carried.reset_index(drop=True)], axis=1
            )

    carried_fields = [f for f in fetched.schema.fields if f.name not in ("url", "html")]
    extract_fields = list(EXTRACT_SCHEMA.fields)
    if keep_set is not None:
        extract_fields.append(T.StructField("html_kept", T.BinaryType()))
    schema = T.StructType(extract_fields + carried_fields)
    return fetched.mapInPandas(run, schema)


@session_memo
def _status_exprs() -> dict:
    """Status-cascade + content-hash trees, cached per SparkContext: the
    wave loop rebuilds this plan every wave, and each F.* call is a py4j
    round trip (per-wave fixed driver latency — VERDICT r2)."""
    text_len = F.length(F.trim(F.coalesce(F.col("text"), F.lit(""))))
    status = (
        F.when(~F.col("found"), F.lit("failed"))
        .when(F.col("is_feed"), F.lit("feed"))
        .when(F.col("is_challenge"), F.lit("proxy_blocked"))
        .when(F.coalesce(F.col("sd_is_wire"), F.lit(False)), F.lit("wire"))
        .when(F.coalesce(F.col("author"), F.lit("")).rlike(WIRE_AUTHOR_RE), F.lit("wire"))
        .when(text_len < 150, F.lit("paywall"))
        .otherwise(F.lit("extracted"))
    )
    content_hash = F.when(
        F.col("text").isNotNull() & (F.col("text") != ""),
        F.sha2(F.col("text"), 256),
    )
    return {"fetch_status": status, "content_hash": content_hash}


def with_status(extracted: DataFrame) -> DataFrame:
    """Apply the deterministic status cascade (column exprs only).

    Wire detection follows the reference's C17 stage precedence
    (/root/reference/src/cli/commands/extraction.py:1344-1502):
    stage 1 JSON-LD/meta provider signals → stage 2 byline patterns.
    """
    return extracted.withColumns(_status_exprs())
