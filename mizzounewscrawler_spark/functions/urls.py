"""URL canonicalization → SURT → xxhash64 keys.

Re-expresses the reference's lossy URL canonicalizer
(/root/reference/src/mcmetadata/urls.py:290-344 — strip port, lowercase,
drop mobile/www-like subdomains, remove ~40 tracking params, drop fragment;
and /root/reference/src/utils/url_utils.py:9-56 — strip query/fragment,
trailing slash) as ONE deterministic spec with two implementations:

- ``canonical_parts`` / ``surt_expr``: native Spark column expressions
  (regexp + higher-order array functions) — the 100 TB hot path, fully
  inside whole-stage codegen, no Python.
- ``canonicalize_url`` / ``surt``: a pure-Python twin used by the
  reference-faithful sequential simulator and golden-fixture generation.

``test_urls.py`` property-tests the two implementations byte-equal over the
fixture corpus; the crawl-parity suite then compares URL-seen *sets* built by
each path (north rule: exact URL-seen-set parity).

Canonicalization spec (deterministic, ASCII URLs):
 1. trim; require scheme http/https (case-insensitive), else NULL (invalid).
 2. drop userinfo; lowercase host; strip any port; strip leading
    ``www\\d*.`` / ``m.`` / ``mobile.`` / ``amp.`` label runs.
 3. path: collapse ``//``, drop trailing ``/index.htm(l)|.php|.asp(x)``,
    strip trailing slashes.
 4. query: split on ``&``; drop empty params and tracking params
    (``utm_*``, ``ga_*``, ``_*`` prefixes + fixed key panel); sort params;
    rejoin. Fragment always dropped.
 5. SURT = reversed host labels joined by ``,`` + ``)`` + path + ``?query``;
    scheme dropped (http/https collapse — intentional dedup widening vs the
    reference, documented).
 6. key = xxhash64(SURT) (north rule; reference used sha256 of the
    normalized url, /root/reference/src/mcmetadata/urls.py:409-416 — a
    ``sha2`` parity column remains available via ``sha256_expr``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed tracking-parameter panel (reference's ~40-key panel,
# /root/reference/src/mcmetadata/urls.py:167-260, re-specced).
TRACKING_KEYS = frozenset(
    {
        "gclid",
        "fbclid",
        "dclid",
        "msclkid",
        "mc_cid",
        "mc_eid",
        "igshid",
        "ref",
        "refid",
        "referrer",
        "source",
        "src",
        "share",
        "ic_id",
        "cmp",
        "cmpid",
        "camp",
        "campaign",
        "s_cid",
        "ncid",
        "ocid",
        "rss",
        "ftag",
        "smid",
        "smtyp",
        "sh",
        "spm",
        "scrolla",
        "mbid",
        "cndid",
        "esrc",
        "ito",
        "soc_src",
        "soc_trk",
        "wpsrc",
        "wpisrc",
    }
)
TRACKING_PREFIX_RE = r"^(utm_|ga_|_)"
_TRACKING_KEYS_ALT = "|".join(sorted(TRACKING_KEYS))
# one regex deciding "drop this query param", applied to the key
TRACKING_KEY_RE = rf"(?:{TRACKING_PREFIX_RE.strip('^')}.*|{_TRACKING_KEYS_ALT})"

_SCHEME_RE = r"^(?i)https?://"
_SUBDOMAIN_STRIP_RE = r"^(?:www\d*\.|m\.|mobile\.|amp\.)+"
_INDEX_FILE_RE = r"/index\.(?:html?|php|aspx?)$"


# --------------------------------------------------------------------------
# Native column-expression path (the scale path — no Python in the plan)
# --------------------------------------------------------------------------


def canonical_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """Return (valid, host, path, query) canonical columns for ``url``."""
    u = F.trim(url)
    valid = u.rlike(_SCHEME_RE)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, r"^[^/@]*@", "")
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    host = F.regexp_replace(host, _SUBDOMAIN_STRIP_RE, "")
    pathqf = F.substring(rest, F.length(authority) + F.lit(1), F.lit(1 << 20))
    path = F.regexp_extract(pathqf, r"^([^?#]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, _INDEX_FILE_RE, "/")
    path = F.regexp_replace(path, r"/+$", "")
    query_raw = F.regexp_extract(pathqf, r"^[^?#]*\?([^#]*)", 1)
    tokens = F.split(query_raw, "&")
    kept = F.filter(
        tokens,
        lambda t: (t != F.lit(""))
        & ~F.regexp_extract(t, r"^([^=]*)", 1).rlike(rf"^(?:{TRACKING_KEY_RE})$"),
    )
    query = F.array_join(F.array_sort(kept), "&")
    return valid, host, path, query


def host_expr(url: Column) -> Column:
    """Normalized host (lowercase, no www./m./port) — reference
    ``_normalize_host`` /root/reference/src/crawler/discovery.py:418-440."""
    _, host, _, _ = canonical_parts(url)
    return host


# C4 canonical_domain: public-suffix registered-domain semantics (reference
# /root/reference/src/mcmetadata/urls.py:51-103 via tldextract).  A compact
# built-in suffix set covers the multi-label public suffixes a news crawl
# actually meets; everything else falls back to the last two labels.  The
# blog-platform exception list keeps the distinguishing subdomain (reference
# keeps `<name>.substack.com` etc. as the canonical identity).
_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "org.br", "net.br", "gov.br",
    "co.in", "org.in", "net.in", "gov.in", "ac.in",
    "com.mx", "org.mx", "com.ar", "com.cn", "org.cn", "net.cn",
    "co.za", "org.za", "com.sg", "com.hk", "co.kr", "or.kr",
)
_PLATFORM_SUFFIXES = (
    "substack.com", "blogspot.com", "wordpress.com", "medium.com",
    "tumblr.com", "github.io", "typepad.com", "squarespace.com",
)


def registered_domain_expr(host: Column) -> Column:
    """C4: registered domain of a normalized host — public-suffix-aware
    (suffix + one label), keeping the platform subdomain for blog hosts,
    passing IPv4 literals through unchanged.  Pure JVM regex/`when` ladder;
    the reference calls tldextract per row in Python."""
    ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    expr = F.when(ip, host)
    for suf in _PLATFORM_SUFFIXES:
        esc = suf.replace(".", r"\.")
        expr = expr.when(
            host.rlike(rf"(^|\.)[^.]+\.{esc}$"),
            F.regexp_extract(host, rf"([^.]+\.{esc})$", 1),
        )
    for suf in _TWO_LABEL_SUFFIXES:
        esc = suf.replace(".", r"\.")
        expr = expr.when(
            host.rlike(rf"(^|\.)[^.]+\.{esc}$"),
            F.regexp_extract(host, rf"([^.]+\.{esc})$", 1),
        )
    return expr.otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def registered_domain(host: str) -> str:
    """Pure-Python twin of :func:`registered_domain_expr` (parity tests)."""
    import re as _re

    if _re.match(r"^\d{1,3}(\.\d{1,3}){3}$", host):
        return host
    for suf in (*_PLATFORM_SUFFIXES, *_TWO_LABEL_SUFFIXES):
        if host == suf or host.endswith("." + suf):
            m = _re.search(r"([^.]+\." + suf.replace(".", r"\.") + ")$", host)
            if m:
                return m.group(1)
    m = _re.search(r"([^.]+\.[^.]+)$", host)
    return m.group(1) if m else host


def surt_expr(url: Column) -> Column:
    """SURT-canonical form, NULL for invalid URLs."""
    valid, host, path, query = canonical_parts(url)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    surt = F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(valid & (host != ""), surt)


def url_hash_expr(surt: Column) -> Column:
    """The frontier key: xxhash64 of the SURT string (seed 42, Spark default)."""
    return F.xxhash64(surt)


def sha256_expr(col: Column) -> Column:
    """Reference-parity hash column (mcmetadata ``unique_url_hash`` used
    sha256, /root/reference/src/mcmetadata/urls.py:409-416)."""
    return F.sha2(col, 256)


def is_valid_url_expr(url: Column) -> Column:
    """Reference ``is_valid_url`` /root/reference/src/crawler/__init__.py:356."""
    return F.trim(url).rlike(r"^(?i)https?://[^/?#\s]+")


def is_homepage_expr(url: Column) -> Column:
    """Path-shape homepage predicate (reference ``is_homepage_url``
    /root/reference/src/mcmetadata/urls.py:366-378)."""
    _, _, path, query = canonical_parts(url)
    return (path == "") & (query == "")


# --------------------------------------------------------------------------
# Pure-Python twin (simulator / fixture generation only — never in a Spark plan)
# --------------------------------------------------------------------------

_py_scheme = re.compile(r"^https?://", re.IGNORECASE)
_py_sub = re.compile(_SUBDOMAIN_STRIP_RE)
_py_index = re.compile(_INDEX_FILE_RE)
_py_track = re.compile(rf"^(?:{TRACKING_KEY_RE})$")


def canonicalize_url(url: str) -> tuple[str, str, str] | None:
    """Return (host, path, query) canonical parts, or None if invalid.

    Must stay step-for-step identical to :func:`canonical_parts`.
    """
    u = url.strip()
    if not _py_scheme.match(u):
        return None
    rest = _py_scheme.sub("", u, count=1)
    m = re.match(r"^([^/?#]*)", rest)
    authority = m.group(1)
    hostport = re.sub(r"^[^/@]*@", "", authority)
    host = re.sub(r":\d+$", "", hostport).lower()
    host = _py_sub.sub("", host)
    if host == "":
        return None
    pathqf = rest[len(authority) :]
    m = re.match(r"^([^?#]*)", pathqf)
    path = m.group(1)
    path = re.sub(r"/{2,}", "/", path)
    path = _py_index.sub("/", path)
    path = re.sub(r"/+$", "", path)
    qm = re.match(r"^[^?#]*\?([^#]*)", pathqf)
    query_raw = qm.group(1) if qm else ""
    kept = [
        t
        for t in query_raw.split("&")
        if t != "" and not _py_track.match(re.match(r"^([^=]*)", t).group(1))
    ]
    query = "&".join(sorted(kept))
    return host, path, query


def surt(url: str) -> str | None:
    """Pure-Python SURT, byte-equal to :func:`surt_expr`."""
    parts = canonicalize_url(url)
    if parts is None:
        return None
    host, path, query = parts
    rev = ",".join(reversed(host.split(".")))
    return rev + ")" + path + (("?" + query) if query else "")


# --------------------------------------------------------------------------
# Pure-Python xxhash64 (XXH64 public spec) — simulator twin of F.xxhash64
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data``; Spark's ``F.xxhash64`` uses seed 42 and returns a
    signed 64-bit value — so does this (verified in test_urls.py)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def url_hash(surt_str: str) -> int:
    return xxhash64(surt_str.encode("utf-8"))
