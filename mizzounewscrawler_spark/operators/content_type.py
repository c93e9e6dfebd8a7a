"""Content-type detection cascade (reference ``ContentTypeDetector.detect``,
/root/reference/src/utils/content_type_detector.py, 1,573 LoC; wire staging
/root/reference/src/cli/commands/extraction.py:1344-1502 — SURVEY.md C16/C17).

The reference walks regex panels per row in Python; here the panels are a
single ordered ``when``-ladder of column expressions.  **Stage order is the
parity contract** (C17): url patterns → byline wire → title patterns →
content patterns → default, first hit wins, with a fixed confidence per
stage (the reference's per-pattern confidences, collapsed to stage level).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mizzounewscrawler_spark.functions.byline import clean_byline_expr

URL_PANELS: list[tuple[str, str, float]] = [
    # (content_type, url regex, confidence) — reference url_path patterns
    ("opinion", r"(?i)/(opinion|editorial|letters|column(ist)?s?)/", 0.95),
    ("obituary", r"(?i)/(obituar(y|ies)|deaths?)/", 0.95),
    ("sports", r"(?i)/sports?/", 0.90),
    ("event", r"(?i)/(events?|calendar)/", 0.85),
]
TITLE_PANELS: list[tuple[str, str, float]] = [
    ("opinion", r"(?i)^(opinion|editorial|letter( to the editor)?)[:|\-]", 0.85),
    ("obituary", r"(?i)\bobituar(y|ies)\b", 0.85),
]
CONTENT_PANELS: list[tuple[str, str, float]] = [
    ("obituary", r"(?i)\b(passed away|survived by|funeral services?)\b", 0.75),
    ("event", r"(?i)\b(will be held|doors open at|tickets (are )?available)\b", 0.65),
]

# Local-broadcaster callsign exemption (reference
# /root/reference/src/utils/content_type_detector.py:30-56,995-1057; DB
# table src/models/__init__.py:298-354): a "City, ST (CALLSIGN) —" dateline
# at the content start marks SYNDICATED (wire) content only when the
# callsign belongs to a known local broadcaster AND the url is NOT that
# broadcaster's own site — a broadcaster's dateline on its own site is
# local content (the exemption); unknown callsigns are never flagged
# (out-of-market broadcasters).  The callsign set is one more broadcast
# row-set feeding the O5 pattern table.
CALLSIGN_TABLE_SCHEMA = "callsign string, domains array<string>, dataset string"
DEFAULT_CALLSIGN_ROWS: list[tuple] = [
    # reference _CALLSIGN_DOMAINS, content_type_detector.py:49-56
    ("KMIZ", ["abc17news.com"], "missouri"),
    ("KOMU", ["komu.com"], "missouri"),
    ("KRCG", ["krcgtv.com"], "missouri"),
    ("KQFX", ["fox22now.com"], "missouri"),
]

DATELINE_RE = r"\(([A-Z]{3,5})\)\s*[—–-]"

# Known wire-service domains for the canonical-cross-domain syndication
# check (transcribed public config map, reference _WIRE_SERVICE_DOMAINS,
# /root/reference/src/crawler/__init__.py:220-239)
WIRE_SERVICE_DOMAINS: dict[str, str] = {
    "apnews.com": "The Associated Press",
    "ap.org": "The Associated Press",
    "reuters.com": "Reuters",
    "bloomberg.com": "Bloomberg",
    "afp.com": "Agence France-Presse",
    "usatoday.com": "USA Today",
    "cnn.com": "CNN",
    "foxnews.com": "Fox News",
    "nbcnews.com": "NBC News",
    "abcnews.go.com": "ABC News",
    "cbsnews.com": "CBS News",
    "healthday.com": "HealthDay",
    "upi.com": "UPI",
    "npr.org": "NPR",
    "pbs.org": "PBS",
    "washingtonpost.com": "Washington Post",
    "nytimes.com": "New York Times",
    "latimes.com": "Los Angeles Times",
}


def _meta_property_expr(html: Column, prop: str) -> Column:
    """content of ``<meta property="{prop}" content="...">`` in either
    attribute order, '' when absent."""
    a = F.regexp_extract(
        html,
        r'(?i)<meta\s+[^>]*property\s*=\s*["\']' + prop
        + r'["\'][^>]*content\s*=\s*["\']([^"\']+)["\']',
        1,
    )
    b = F.regexp_extract(
        html,
        r'(?i)<meta\s+[^>]*content\s*=\s*["\']([^"\']+)["\'][^>]*'
        r'property\s*=\s*["\']' + prop + r'["\']',
        1,
    )
    return F.when(a != "", a).otherwise(b)


def distributor_wire_expr(html: Column) -> Column:
    """struct(is_wire, wire_name) from OpenGraph distributor meta tags —
    the reference's wire check #1 (og_distributor_category,
    crawler/__init__.py:4230-4256; Gray-TV-style CMS markup):
    ``article:distributor_category`` ∈ wires/wire/syndicated/syndication
    is the strong signal, ``article:distributor_name`` carries the
    service name.  Both attribute orders handled, like the reference's
    RE/ALT_RE pairs."""
    cat = F.lower(
        F.trim(_meta_property_expr(html, "article:distributor_category"))
    )
    name = F.trim(_meta_property_expr(html, "article:distributor_name"))
    is_wire = cat.isin("wires", "wire", "syndicated", "syndication")
    return F.struct(
        is_wire.alias("is_wire"),
        F.when(is_wire & (name != ""), name).alias("wire_name"),
    )


def _wire_name_for_url(u: Column) -> Column:
    """Wire-service name when any known wire domain appears as a substring
    of ``u`` (lowercased) — the reference's loose `domain in value` check
    used by its jsonld_isBasedOn / jsonld_mainEntity / datalayer_origin
    signals; NULL when none match."""
    lo = F.lower(u)
    name: Column = None
    for dom, wire in WIRE_SERVICE_DOMAINS.items():
        hit = lo.contains(dom)
        name = F.when(hit, F.lit(wire)) if name is None else name.when(
            hit, F.lit(wire)
        )
    return name


def syndication_signals_expr(html: Column) -> Column:
    """struct(is_wire, wire_name, method) from the reference's deeper
    CMS/JSON-LD syndication signals (crawler/__init__.py:4333-4470),
    first hit wins in its order:

    - ``jsonld_isBasedOn``: JSON-LD ``isBasedOn`` URL on a known wire
      domain;
    - ``jsonld_mainEntity``: ``mainEntityOfPage.@id`` on a wire domain;
    - ``jsonld_contentSourceCode``: Gannett embedded-metadata
      ``contentSourceCode == "USAT"`` (the metadata field is a
      JSON-encoded string, so the quotes arrive escaped);
    - ``datalayer_syndication``: TownNews ``tncms.syndication.source`` /
      ``townnews.content.source`` value (names the external source);
    - ``datalayer_origin``: ``tncms.syndication.origin`` URL on a wire
      domain.

    Pure regexp_extract + when-chains — the reference walks JSON blocks
    in Python per row; the flat-regex form accepts the same markup (the
    fields are CMS-emitted, not adversarial)."""
    based = F.regexp_extract(
        html, r'(?i)"isBasedOn"\s*:\s*"([^"]+)"', 1
    )
    main_id = F.regexp_extract(
        html,
        r'(?i)"mainEntityOfPage"\s*:\s*\{[^}]*"@id"\s*:\s*"([^"]+)"',
        1,
    )
    gannett = F.regexp_extract(
        html, r'(?i)\\?"contentSourceCode\\?"\s*:\s*\\?"(USAT)\\?"', 1
    )
    tn_src = F.regexp_extract(
        html,
        r'(?i)["\']?(?:tncms\.syndication\.source|townnews\.content\.source)'
        r'["\']?\s*[=:]\s*["\']([^"\']+)["\']',
        1,
    )
    tn_origin = F.regexp_extract(
        html,
        r'(?i)["\']?tncms\.syndication\.origin["\']?\s*[=:]\s*["\']([^"\']+)["\']',
        1,
    )
    based_name = _wire_name_for_url(based)
    main_name = _wire_name_for_url(main_id)
    origin_name = _wire_name_for_url(tn_origin)
    picked = (
        F.when(
            (based != "") & based_name.isNotNull(),
            F.struct(
                based_name.alias("wire_name"),
                F.lit("jsonld_isBasedOn").alias("method"),
            ),
        )
        .when(
            (main_id != "") & main_name.isNotNull(),
            F.struct(
                main_name.alias("wire_name"),
                F.lit("jsonld_mainEntity").alias("method"),
            ),
        )
        .when(
            gannett == "USAT",
            F.struct(
                F.lit("USA Today").alias("wire_name"),
                F.lit("jsonld_contentSourceCode").alias("method"),
            ),
        )
        .when(
            tn_src != "",
            F.struct(
                F.trim(tn_src).alias("wire_name"),
                F.lit("datalayer_syndication").alias("method"),
            ),
        )
        .when(
            (tn_origin != "") & origin_name.isNotNull(),
            F.struct(
                origin_name.alias("wire_name"),
                F.lit("datalayer_origin").alias("method"),
            ),
        )
    )
    return F.struct(
        picked.isNotNull().alias("is_wire"),
        picked["wire_name"].alias("wire_name"),
        picked["method"].alias("method"),
    )


def canonical_url_expr(html: Column) -> Column:
    """``<link rel="canonical">`` href, NULL when absent — both attribute
    orders (rel-then-href and href-then-rel), mirroring the reference's
    _CANONICAL_LINK_RE / _CANONICAL_LINK_ALT_RE pair
    (/root/reference/src/crawler/__init__.py:183-190)."""
    a = F.regexp_extract(
        html,
        r'(?i)<link\s+[^>]*rel\s*=\s*["\']canonical["\'][^>]*href\s*=\s*["\']([^"\']+)["\']',
        1,
    )
    b = F.regexp_extract(
        html,
        r'(?i)<link\s+[^>]*href\s*=\s*["\']([^"\']+)["\'][^>]*rel\s*=\s*["\']canonical["\']',
        1,
    )
    pick = F.when(a != "", a).otherwise(F.when(b != "", b))
    return F.trim(pick)


def canonical_syndication_expr(url: Column, canonical: Column) -> Column:
    """struct(is_syndicated, wire_name) from a page's URL and its
    ``<link rel=canonical>`` target — the reference's check #2 inside wire
    detection (canonical_cross_domain, crawler/__init__.py:4258-4313): a
    canonical pointing at a DIFFERENT registrable host marks syndication;
    the wire name is the known-domain map hit (exact, then subdomain
    suffix, e.g. consumer.healthday.com), else the canonical domain
    itself (unknown syndicators — Hearst-style station networks).  Pure
    column expressions; the domain map folds into one when-chain."""

    def _dom(u: Column) -> Column:
        d = F.lower(F.regexp_extract(u, r"^https?://([^/]+)", 1))
        return F.regexp_replace(d, r"^www\.", "")

    cd, ad = _dom(canonical), _dom(url)
    cross = canonical.isNotNull() & (cd != "") & (ad != "") & (cd != ad)
    name: Column = None
    for dom, wire in WIRE_SERVICE_DOMAINS.items():
        hit = (cd == dom) | cd.endswith("." + dom)
        name = F.when(hit, F.lit(wire)) if name is None else name.when(
            hit, F.lit(wire)
        )
    name = name.otherwise(cd)
    return F.struct(
        cross.alias("is_syndicated"),
        F.when(cross, name).alias("wire_name"),
    )


def dateline_wire_marker_expr(
    text: Column, url: Column, callsign_rows: list[tuple] | None = None
) -> Column:
    """'WIRE' when the content-start broadcaster dateline credits a local
    callsign whose site is NOT this url (syndicated); '' otherwise — the
    callsign-exemption decision as one JVM when-chain over the broadcast
    callsign row-set (dimension-sized, like the O5 pattern rows)."""
    rows = DEFAULT_CALLSIGN_ROWS if callsign_rows is None else callsign_rows
    cs = F.regexp_extract(F.substring(text, 1, 300), DATELINE_RE, 1)
    # ownership = the url's HOST is one of the broadcaster's registered
    # domains (reference keys on the domain list only) — matching the
    # callsign anywhere in the url would exempt third-party pages that
    # merely mention it in a path segment
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    expr: Column = F.lit("")  # unknown callsign → never wire
    for callsign, domains, _dataset in rows:
        owns = F.lit(False)
        for d in domains:
            dl = d.lower()
            owns = owns | (host == F.lit(dl)) | host.endswith(F.lit("." + dl))
        expr = F.when(
            cs == callsign,
            F.when(owns, F.lit("")).otherwise(F.lit("WIRE")),
        ).otherwise(expr)
    return expr


# O5: the data-driven priority-table form of the cascade above.  The
# reference stores its patterns in a ``wire_services``/detector table and
# matches in ``ORDER BY priority, id`` — lower priority value wins first
# (src/crawler/__init__.py:4516, src/utils/content_type_detector.py:333).
# ``stage`` names the column the regex applies to.
PATTERN_TABLE_SCHEMA = (
    "id int, stage string, content_type string, pattern string, "
    "priority int, confidence double, active boolean"
)
DEFAULT_PATTERN_ROWS: list[tuple] = [
    # priority bands reproduce the static stage order: url(10) → byline
    # wire(20) → title(30) → content(40); within a band id breaks ties
    *[
        (i + 1, "url", label, pat, 10, c, True)
        for i, (label, pat, c) in enumerate(URL_PANELS)
    ],
    (
        10, "byline", "wire",
        r"(?i)^(by[: ])?\s*(the\s+)?(associated press|ap|reuters|afp|cnn newsource)\b",
        20, 0.90, True,
    ),
    *[
        (i + 11, "title", label, pat, 30, c, True)
        for i, (label, pat, c) in enumerate(TITLE_PANELS)
    ],
    # broadcaster dateline (content tier, before the generic content
    # panels): the ``dateline`` stage column is the precomputed
    # syndicated/local marker from dateline_wire_marker_expr — the callsign
    # exemption is decided there, the table just ranks it
    (20, "dateline", "wire", r"^WIRE$", 35, 0.85, True),
    *[
        (i + 21, "content", label, pat, 40, c, True)
        for i, (label, pat, c) in enumerate(CONTENT_PANELS)
    ],
]


def default_pattern_table(df_or_spark) -> DataFrame:
    """The static panels as a pattern-table DataFrame (the shipped seed of
    the reference's detector table)."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.createDataFrame(DEFAULT_PATTERN_ROWS, PATTERN_TABLE_SCHEMA)


def pattern_ladder_from_table(
    patterns: DataFrame, cols: dict[str, Column]
) -> tuple[Column, Column]:
    """Fold the active pattern rows, ordered by (priority, id), into a
    first-match (content_type, confidence) ``when``-ladder.

    The table is a dimension (tens-to-hundreds of rows); collecting it
    driver-side mirrors the reference's TTL pattern cache (F4's shape,
    verification.collapse_dynamic_filters) and keeps classification a pure
    whole-stage-codegen column expression — no join, no row explosion.

    ``cols`` maps stage name → the Column its regexes test against; rows
    whose stage has no mapped column are skipped.
    """
    rows = (
        patterns.where(F.col("active"))
        .select("stage", "content_type", "pattern", "priority", "id", "confidence")
        .orderBy("priority", "id")
        .collect()
    )
    ctype: Column | None = None
    conf: Column | None = None
    for r in rows:
        target = cols.get(r["stage"])
        if target is None:
            continue
        pred = target.rlike(r["pattern"])
        if ctype is None:
            ctype = F.when(pred, F.lit(r["content_type"]))
            conf = F.when(pred, F.lit(r["confidence"]))
        else:
            ctype = ctype.when(pred, F.lit(r["content_type"]))
            conf = conf.when(pred, F.lit(r["confidence"]))
    if ctype is None:
        return F.lit("news"), F.lit(0.5)
    return ctype.otherwise(F.lit("news")), conf.otherwise(F.lit(0.5))


def detect_content_type_tabular(
    df: DataFrame,
    patterns: DataFrame | None = None,
    url_col: str = "url",
    title_col: str = "title",
    author_col: str = "author",
    text_col: str = "text",
    callsign_rows: list[tuple] | None = None,
    dataset: str | None = None,
) -> DataFrame:
    """O5: table-driven first-match-by-(priority, id) content-type cascade.

    Same output columns as :func:`detect_content_type`; pass a custom
    ``patterns`` table to re-prioritize or extend without code changes.
    ``callsign_rows``/``dataset`` feed the broadcaster-dateline stage (the
    callsign exemption — see :func:`dateline_wire_marker_expr`)."""
    pats = patterns if patterns is not None else default_pattern_table(df)
    rows = DEFAULT_CALLSIGN_ROWS if callsign_rows is None else callsign_rows
    if dataset is not None:
        rows = [r for r in rows if r[2] == dataset]
    byline = clean_byline_expr(F.col(author_col))
    cols = {
        "url": F.coalesce(F.col(url_col), F.lit("")),
        "byline": F.coalesce(F.col(author_col), F.lit("")),
        "title": F.coalesce(F.col(title_col), F.lit("")),
        "content": F.coalesce(F.col(text_col), F.lit("")),
        "dateline": dateline_wire_marker_expr(
            F.coalesce(F.col(text_col), F.lit("")),
            F.coalesce(F.col(url_col), F.lit("")),
            rows,
        ),
    }
    ctype, conf = pattern_ladder_from_table(pats, cols)
    return (
        df.withColumn("byline", byline)
        .withColumn("content_type", ctype)
        .withColumn("content_confidence", conf)
    )


# --------------------------------------------------------------------------
# wire_check_status second pass (reference articles columns
# /root/reference/src/models/__init__.py:128-200; initial assignment
# src/cli/commands/extraction.py:103-121; mark-complete :328-334; export
# gate :1513-1516 "only exports … wire_check_status='complete'")
# --------------------------------------------------------------------------

WIRE_CHECK_PENDING = "pending"
WIRE_CHECK_COMPLETE = "complete"
# statuses that never need the wire re-check (reference :114-115)
WIRE_CHECK_SKIP_STATUSES = ("failed", "error", "paywall", "obituary", "opinion")


def initial_wire_check_status_expr(status: Column) -> Column:
    """wire_check_status for a newly written article row: 'complete' only
    for statuses that explicitly never need re-verification; everything
    else — including rows already marked 'wire' — defaults to 'pending' so
    an incorrectly-set status still gets verified (reference
    _initial_wire_check_status, extraction.py:103-121)."""
    return F.when(
        status.isin(*WIRE_CHECK_SKIP_STATUSES), F.lit(WIRE_CHECK_COMPLETE)
    ).otherwise(F.lit(WIRE_CHECK_PENDING))


def wire_recheck(
    articles: DataFrame,
    url_col: str = "url",
    title_col: str = "title",
    author_col: str = "author",
    text_col: str = "text",
    status_col: str = "status",
    callsign_rows: list[tuple] | None = None,
) -> DataFrame:
    """Second-pass wire verification: re-run the full detection cascade
    over PENDING rows, flip their status to/from 'wire' accordingly, and
    mark them 'complete'; rows already complete pass through untouched.

    This is the engine's seam for the reference's external MediaCloud wire
    re-check (extraction.py:328-334): the deterministic cascade stands in
    for the remote service (the sanctioned stub pattern, SURVEY §2.10) —
    swap the verdict expression for a client call on a real deployment.
    Column expressions only, no shuffle.  The cascade (the ~30-regex
    ladder over full text) runs ONLY over the pending slice — in the
    steady state almost every row is already complete, and re-deriving a
    verdict the ``when()`` would discard is pure wasted scan compute at
    scale; the two branches re-union by name."""
    pending = F.col("wire_check_status") == WIRE_CHECK_PENDING
    redet = detect_content_type_tabular(
        articles.where(pending),
        url_col=url_col,
        title_col=title_col,
        author_col=author_col,
        text_col=text_col,
        callsign_rows=callsign_rows,
    )
    verdict_wire = F.col("content_type") == "wire"
    new_status = (
        F.when(verdict_wire, F.lit("wire"))
        .when(
            F.col(status_col) == "wire",
            F.lit("extracted"),  # first pass over-flagged — restore
        )
        .otherwise(F.col(status_col))
    )
    rechecked = (
        redet.withColumn(status_col, new_status)
        .withColumn("wire_check_status", F.lit(WIRE_CHECK_COMPLETE))
        .drop("content_type", "content_confidence", "byline")
    )
    untouched = articles.where(~pending | pending.isNull()).withColumn(
        "wire_check_status", F.lit(WIRE_CHECK_COMPLETE)
    )
    return rechecked.unionByName(untouched)


def detect_content_type(
    df: DataFrame,
    url_col: str = "url",
    title_col: str = "title",
    author_col: str = "author",
    text_col: str = "text",
    canonical_col: str | None = None,
    html_col: str | None = None,
) -> DataFrame:
    """Add (content_type, content_confidence, byline struct) columns.

    ``html_col`` (raw html text) enables the reference's wire check #1 —
    OpenGraph ``article:distributor_category`` meta (stage 2a).
    ``canonical_col`` (a ``<link rel=canonical>`` href column, from
    ``canonical_url_expr``) enables its check #2 — cross-domain canonical
    syndication (stage 2b).  Both sit between the byline and title
    panels, preserving the cascade's first-hit-wins parity order."""
    byline = clean_byline_expr(F.col(author_col))
    url = F.coalesce(F.col(url_col), F.lit(""))
    title = F.coalesce(F.col(title_col), F.lit(""))
    text = F.coalesce(F.col(text_col), F.lit(""))

    ctype: Column = None
    conf: Column = None

    def stage(pred: Column, label: str, c: float):
        nonlocal ctype, conf
        if ctype is None:
            ctype = F.when(pred, F.lit(label))
            conf = F.when(pred, F.lit(c))
        else:
            ctype = ctype.when(pred, F.lit(label))
            conf = conf.when(pred, F.lit(c))

    # stage 1: URL patterns (cheapest, most reliable — reference order)
    for label, pat, c in URL_PANELS:
        stage(url.rlike(pat), label, c)
    # stage 2: wire byline (reference stage-2, extraction.py:1427)
    stage(byline["is_wire"], "wire", 0.90)
    # stage 2a: OG distributor meta (reference wire check #1,
    # crawler/__init__.py:4230-4256) — only when raw html is supplied
    if html_col is not None:
        stage(
            distributor_wire_expr(F.col(html_col))["is_wire"], "wire", 0.92
        )
    # stage 2b: canonical cross-domain syndication (reference wire check
    # #2, crawler/__init__.py:4258-4313) — only when a canonical column
    # is supplied.  Checked BEFORE the JSON-LD/CMS signals: the reference
    # cascade is #1 → #2 → #4, and the extraction-time Python twin
    # (functions/html.syndication_signals) follows the same order — a
    # page carrying both a cross-domain canonical and a JSON-LD isBasedOn
    # must resolve identically on both paths
    if canonical_col is not None:
        synd = canonical_syndication_expr(url, F.col(canonical_col))
        stage(synd["is_syndicated"], "wire", 0.88)
    # stage 2c: deeper CMS/JSON-LD syndication signals (reference wire
    # check #4 — isBasedOn, mainEntityOfPage, Gannett contentSourceCode,
    # TownNews dataLayer)
    if html_col is not None:
        stage(
            syndication_signals_expr(F.col(html_col))["is_wire"],
            "wire",
            0.85,
        )
    # stage 3: title patterns
    for label, pat, c in TITLE_PANELS:
        stage(title.rlike(pat), label, c)
    # stage 4: content patterns (most expensive, last)
    for label, pat, c in CONTENT_PANELS:
        stage(text.rlike(pat), label, c)

    return df.withColumn("byline", byline).withColumn(
        "content_type", ctype.otherwise(F.lit("news"))
    ).withColumn("content_confidence", conf.otherwise(F.lit(0.5)))
