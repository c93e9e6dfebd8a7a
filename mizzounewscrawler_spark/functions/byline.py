"""Byline/author cleaning (reference ``clean_byline``,
/root/reference/src/utils/byline_cleaner.py — 2,769 LoC of per-row string
munging, SURVEY.md §2.8 C13) restated as native column expressions.

Semantics implemented (the reference's core behaviors, re-specced):
- strip leading "By/BY/by " and surrounding whitespace;
- remove email addresses and parenthesized affiliations;
- split multi-author strings on ",", " and ", " & ";
- drop non-person tokens (Staff, Staff Writer/Report(s), Editor, Newsroom,
  Correspondent, Contributor, Special to …);
- detect wire services (AP/Reuters/AFP/CNN) → ``is_wire`` + service name.

Everything is JVM-side (regexp + higher-order array functions): at 100 TB
the byline column cleans inside whole-stage codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WIRE_SERVICES = {
    "associated press": "AP",
    "reuters": "Reuters",
    "afp": "AFP",
    "agence france-presse": "AFP",
    "cnn newsource": "CNN",
}

_WIRE_RE = r"(?i)\b(the\s+)?(associated press|ap|reuters|afp|agence france-presse|cnn newsource)\b"

NON_PERSON_RE = (
    r"(?i)^(staff( writer| reports?| report)?|editor(ial board)?|newsroom|"
    r"correspondent|contributor|special to .*|news service|wire reports?)$"
)


def clean_byline_expr(byline: Column) -> Column:
    """→ struct(authors array<string>, is_wire boolean, wire_service string)."""
    s = F.trim(F.coalesce(byline, F.lit("")))
    s = F.regexp_replace(s, r"(?i)^by[:\s]+", "")
    s = F.regexp_replace(s, r"[\w.+-]+@[\w-]+\.[\w.]+", "")  # emails
    s = F.regexp_replace(s, r"\([^)]*\)", "")  # (affiliations)
    is_wire = s.rlike(_WIRE_RE)
    wire_service = F.lower(F.regexp_extract(s, _WIRE_RE, 2))
    service_map = F.create_map(
        *[F.lit(x) for kv in WIRE_SERVICES.items() for x in kv]
    )
    parts = F.split(s, r"(?i)\s*,\s*|\s+and\s+|\s*&\s*")
    authors = F.filter(
        F.transform(parts, lambda p: F.trim(p)),
        lambda p: (p != "") & ~p.rlike(NON_PERSON_RE) & ~p.rlike(_WIRE_RE),
    )
    return F.struct(
        authors.alias("authors"),
        is_wire.alias("is_wire"),
        F.when(is_wire, service_map[wire_service]).alias("wire_service"),
    )
