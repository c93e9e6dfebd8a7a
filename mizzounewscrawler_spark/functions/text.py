"""Text-analysis column functions: hashing, tokens, quality, lang-ID,
fingerprints, shingles.

Everything here is a *native* Spark column expression (JVM-side, inside
whole-stage codegen) — no Python UDFs in these hot paths.  These back both
the crawl pipeline (content hashing — reference
/root/reference/src/models/database.py:792-794; content-length gates —
/root/reference/src/cli/commands/extraction.py:1518) and the training-data
operators (token counting, quality scoring, language ID, fingerprinting)
that a 100 TB text pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# hashing
# --------------------------------------------------------------------------


def content_hash_expr(text: Column) -> Column:
    """sha256 hex of the text body (reference ``calculate_content_hash``)."""
    return F.sha2(text, 256)


_ROT47_FROM = "".join(chr(33 + i) for i in range(94))
_ROT47_TO = "".join(chr(33 + (i + 47) % 94) for i in range(94))


def rot47_expr(text: Column) -> Column:
    """C15 ROT47 de-obfuscation (reference
    /root/reference/src/pipeline/text_cleaning.py:12-107): rotate printable
    ASCII 33–126 by 47.  A fixed character permutation, so ``F.translate``
    does it entirely JVM-side — the reference's per-char Python loop becomes
    one codegen'd expression.  Self-inverse: rot47(rot47(x)) == x."""
    return F.translate(text, _ROT47_FROM, _ROT47_TO)


def rot47(s: str) -> str:
    """Pure-Python twin of :func:`rot47_expr` (parity tests)."""
    return s.translate(str.maketrans(_ROT47_FROM, _ROT47_TO))


# --------------------------------------------------------------------------
# tokenization / counting
# --------------------------------------------------------------------------

_WS = r"\s+"
# BPE-ish word/punct splitter: words, numbers, or single punctuation marks
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens (empty-string-safe)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """Sub-word-ish token count via regexp extraction (proxy for a BPE
    tokenizer; deterministic and JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------

# compact English stopword panel (fixed, deterministic)
EN_STOPWORDS = (
    "the of and a to in is was for on that with as it at by from this be are "
    "an or not his her they we you i has had have but its their which"
).split()

def stopword_ratio_expr(text: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio_expr(text: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\-]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality score: length signal + stopword signal −
    punctuation-excess penalty.  The formula is fixed and documented so the
    DuckDB oracle can restate it exactly (see plans/relational.py)."""
    length_sig = F.least(F.length(text).cast("double") / F.lit(2000.0), F.lit(1.0))
    stop_sig = F.least(stopword_ratio_expr(text) * F.lit(2.5), F.lit(1.0))
    punct_pen = F.greatest(
        punct_ratio_expr(text) - F.lit(0.15), F.lit(0.0)
    ) * F.lit(2.0)
    score = length_sig * F.lit(0.5) + stop_sig * F.lit(0.5) - punct_pen
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 4)


# --------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# --------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is was for with that".split(),
    "es": "el la los las de que en un una por".split(),
    "fr": "le la les des une est dans pour que au".split(),
    "de": "der die das und ist ein eine nicht mit von".split(),
}


def lang_id_expr(text: Column) -> Column:
    """Pick the language whose marker-word hit count is highest (ties break
    by fixed language order en,es,fr,de; no hits → 'und').

    The token array AND the per-language score array are each bound once
    (see :func:`bind_once`): the argmax when-chain nests every earlier
    language's score inside the later comparisons, so unbound scores would
    re-tokenize + re-scan the document a combinatorial number of times in
    interpreted HOF eval."""
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))

    def _scores(ts: Column) -> Column:
        def _marker_hits(words: list[str]):
            # NB: close over the array; a defaulted lambda param would be
            # (mis)read by PySpark as a second lambda variable
            arr = F.array(*[F.lit(w) for w in words])
            return F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))

        return F.array(*[_marker_hits(w) for w in LANG_MARKERS.values()])

    def _pick(sc: Column) -> Column:
        best = F.lit("und")
        best_score = F.lit(0)
        # iterate reversed with >= (plus a >0 guard) so EARLIER languages
        # win ties: a later-processed (earlier-listed) language displaces
        # an equal score, and zero hits never displace 'und'
        for i, lang in reversed(list(enumerate(LANG_MARKERS))):
            s = F.element_at(sc, i + 1)
            take = (s >= best_score) & (s > 0)
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_score = F.when(take, s).otherwise(best_score)
        return best

    return bind_once(bind_once(toks, _scores), _pick)


# --------------------------------------------------------------------------
# shingles + fingerprinting
# --------------------------------------------------------------------------


def bind_once(col: Column, build) -> Column:
    """Evaluate ``col`` ONCE per row and hand the bound value to ``build``.

    Spark's higher-order functions (transform/filter/aggregate) are
    ``CodegenFallback`` — interpreted eval with no common-subexpression
    elimination — so a captured subtree inside a lambda is RE-EVALUATED on
    every lambda invocation.  An expression like
    ``transform(idx, i -> slice(toks, i, k))`` therefore re-tokenizes the
    whole document once per shingle: O(n²) per row, and each additional
    reference (``size(toks)``, one per MinHash permutation, …) multiplies
    it again.  Wrapping the expensive value in a single-element array and
    transforming over it binds it to a *lambda variable*, which IS an O(1)
    read, so every reference inside ``build`` is cheap:

        bind_once(toks, lambda ts: <expr referencing ts many times>)
    """
    return F.element_at(F.transform(F.array(col), build), 1)


def word_shingles_expr(text: Column, k: int = 3) -> Column:
    """Array of word k-shingles (space-joined).

    NB: guarded for n < k — Spark's ``sequence(1, 0)`` is the *descending*
    sequence [1, 0], which would feed ``slice`` an invalid start of 0.
    The token array is bound once (see :func:`bind_once`); capturing it in
    the per-index lambda would re-tokenize the document per shingle.
    """
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))

    def _inner(ts: Column) -> Column:
        n = F.size(ts)
        idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.array_join(F.slice(ts, i, k), " "))

    # null text → size()=null → empty idx in the original formulation; keep
    # the empty-array (never null) contract for explode()/size() consumers
    return F.coalesce(
        bind_once(toks, _inner), F.array().cast("array<string>")
    )


def shingle_hashes_expr(text: Column, k: int = 3) -> Column:
    """array<bigint>: xxhash64 of each word k-shingle — the one-pass base
    array that every MinHash permutation / fingerprint min reuses."""
    return bind_once(
        word_shingles_expr(text, k),
        lambda sh: F.transform(sh, lambda s: F.xxhash64(s)),
    )


def fingerprint_expr(text: Column, k: int = 3) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over word k-shingles
    (a 1-permutation MinHash; winnowing-style representative)."""
    return bind_once(
        shingle_hashes_expr(text, k),
        lambda hs: F.when(F.size(hs) > 0, F.array_min(hs)).otherwise(
            F.lit(None)
        ),
    )


def minhash_signature_from_hashes(hashes: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint>) from a bound shingle-hash array:
    permutation i = min over shingle hashes h of xxhash64(i, h) — a fresh
    JVM-native 64-bit mix per permutation, no string work.  ``hashes``
    must be a cheap reference (lambda variable / attribute), not an
    expensive subtree: it is referenced 2×num_hashes times."""
    def _perm_min(i: int):
        return F.when(
            F.size(hashes) > 0,
            F.array_min(
                F.transform(hashes, lambda h: F.xxhash64(F.lit(i), h))
            ),
        )

    return F.array(*[_perm_min(i) for i in range(num_hashes)])


def minhash_signature_expr(text: Column, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature as array<bigint>: tokenize + shingle + hash the
    document ONCE, then take per-permutation minima of a cheap re-mix
    (xxhash64(perm_index, shingle_hash)).  Empty/short docs yield an array
    of nulls (shape-stable for the banding step)."""
    return bind_once(
        shingle_hashes_expr(text, k),
        lambda hs: minhash_signature_from_hashes(hs, num_hashes),
    )


def simhash_expr(text: Column, bits: int = 64) -> Column:
    """SimHash over word tokens: sign-sum of per-token xxhash64 bits.

    Implemented with native higher-order functions: for each bit b, count
    tokens whose hash has bit b set; bit is 1 in the result iff that count
    exceeds half the token count.  O(bits) expressions, JVM-side; the
    token-hash array is bound once (64 per-bit references otherwise each
    re-tokenize + re-hash the document — see :func:`bind_once`).
    """
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _inner(hs: Column) -> Column:
        n = F.size(hs)

        def _ones_at(b: int):
            return F.size(
                F.filter(hs, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
            )

        acc = F.lit(0).cast("long")
        for b in range(bits):
            ones = _ones_at(b)
            bit_set = (ones * 2) > n
            bit_val = F.shiftleft(F.lit(1).cast("long"), b)  # b=63 wraps to min-long: correct bit pattern
            acc = acc.bitwiseOR(F.when(bit_set, bit_val).otherwise(F.lit(0).cast("long")))
        return F.when(n > 0, acc)

    return bind_once(hashes, _inner)


# --------------------------------------------------------------------------
# PII redaction (training-corpus scrubbing)
# --------------------------------------------------------------------------

# (kind, pattern, replacement) — applied in order; patterns are written in
# the Java/RE2 common subset so the DuckDB oracle can run them verbatim.
# Order matters: SSN before phone (both are dashed digit groups), phone
# before IPv4 (both can be dotted digit groups).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\+\d{1,3}[-. ]?\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_count_expr(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (counted on the raw text, JVM regex)."""
    pat = next(p for k, p, _ in PII_PATTERNS if k == kind)
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0))


def pii_redact_expr(text: Column) -> Column:
    """Replace every PII match with its typed placeholder — one chained
    JVM ``regexp_replace`` per kind, whole-stage-codegen friendly (no
    Python in the scrub path; at 100 TB this runs inside the scan stage)."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def compression_ratio_col(text: Column, level: int = 6) -> Column:
    """zlib compression-ratio quality signal (the Dolma/RefinedWeb
    repetitiveness proxy): compressed_bytes / raw_utf8_bytes, rounded to 6.

    Low (<~0.35) = highly repetitive/templated text (SEO farms, boilerplate
    loops the word-level Gopher gates can miss); high (>~0.8) = near-
    incompressible noise (base64 blobs, minified junk).  NULL for NULL or
    empty text.

    Arrow-batched pandas UDF — zlib is C and CPU-bound, and no JVM
    expression equivalent exists; the compression level is pinned so the
    signal is bit-reproducible across runs and engines.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    def _ratio(s):
        import zlib

        def one(x):
            if x is None:
                return None
            b = x.encode("utf-8", "ignore")
            if not b:
                return None
            return round(len(zlib.compress(b, lvl)) / len(b), 6)

        return s.map(one)

    # explicit annotations (module has `from __future__ import annotations`,
    # which would stringify inline hints beyond pyspark's resolver)
    _ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_ratio, "double")(text)


def hash_embedding_expr(text: Column, dim: int = 32) -> Column:
    """Signed feature-hashing text embedding (the "hashing trick",
    Weinberger et al. 2009): each lowercased whitespace token hashes to
    one of ``dim`` buckets with a ±1 sign, and the embedding is the
    per-bucket signed count — an INTEGER array<long>, model-free and
    deterministic, the classic cheap text vectorizer for dedup /
    clustering / ANN recall at corpus scale.

    Hash arithmetic is md5-hex-pinned (bucket = first 8 hex chars mod
    dim, sign = 9th hex nibble < 8) exactly like the HLL/CMS sketches,
    so a SQL engine reproduces the vectors bit-for-bit — the catalog's
    ``hash_embed_topk`` oracle recomputes the whole text→vector→top-k
    pipeline in DuckDB.  The (bucket, sign) pair array is bound once per
    row (2 md5s per token total); the dim-length rebuild then only
    filters/sums that small struct array (see :func:`bind_once`).
    NULL text embeds as the all-zero vector (shape-stable)."""
    toks = F.transform(
        F.coalesce(tokens_expr(text), F.array().cast("array<string>")),
        lambda t: F.lower(t),
    )

    def _pair(t: Column) -> Column:
        h = F.md5(t)
        bucket = F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim)
        )
        sign = (
            F.when(F.conv(F.substring(h, 9, 1), 16, 10).cast("long") < 8, 1)
            .otherwise(-1)
            .cast("long")
        )
        return F.struct(bucket.alias("b"), sign.alias("s"))

    pairs = F.transform(toks, _pair)

    def _inner(ps: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.aggregate(
                F.filter(ps, lambda p: p["b"] == i.cast("long")),
                F.lit(0).cast("long"),
                lambda acc, p: acc + p["s"],
            ),
        )

    return bind_once(pairs, _inner)
