"""PII detection and redaction over text columns.

The training-data counterpart of a DLP pass: find and mask emails,
phone numbers, and IPv4 addresses before a corpus ships. Beyond-parity
(the reference engine has no text operators); pure regexp projections —
whole-stage codegen, zero shuffle, so a 100 TB redaction pass costs one
scan and writes the same partitioning it read.

Patterns are stored as CANONICAL regex (``\\b`` boundaries, explicit
character classes, ``[.]`` for a literal dot) valid under Java regex,
RE2, and Python ``re`` alike; ``sql_pattern`` applies the one dialect
difference — Spark's escape-processing string literals need each
backslash doubled in the SQL text, DuckDB's don't. The ``\\b`` anchors
matter: without them the ipv4/phone detectors match INSIDE longer
dotted/dashed digit runs ("release 10.2.3.4567" → "release <IP>7"),
mangling version strings and reference numbers — caught in the round-6
self-review after an earlier backslash-free rewrite dropped them.
Deliberate trade: ``\\b`` also declines letter-ADJACENT matches
("build10.1.2.3" keeps its digits) — standard DLP-scanner behavior;
a pipeline that must catch gluded-on PII swaps the anchors for
lookaround guards and re-runs the planted tests.

Two registry entries share these patterns: ``pii_scrub`` (text.py)
redacts the documents table exactly as stored, and ``pii_scan`` below.
The fixture corpus contains no PII, so the registered query PLANTS a
deterministic contact line per document (email/phone/IP derived from
doc_id with pure integer arithmetic) before scanning: both engines
synthesize the identical line, the detectors fire on every row, and the
DuckDB oracle value-checks counts AND redacted text — not a vacuous
all-zeros pass. tests/test_curation.py adds planted edge cases
(multiple hits, boundary-adjacent text, clean docs).
"""

from __future__ import annotations

import textwrap

from .. import dialect as dl
from ..registry import register_sql

#: Detector patterns, least-to-most generic; redaction applies in this
#: order so an IP inside a phone-like digit run is claimed by the more
#: specific pattern first.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
    "ipv4": "\\b[0-9]{1,3}(?:[.][0-9]{1,3}){3}\\b",
    "phone": "\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b",
}


def sql_pattern(pat: str, d: str) -> str:
    """Render a canonical pattern for embedding in a SQL string literal:
    Spark consumes one level of backslashes at parse time, DuckDB none."""
    return pat.replace("\\", "\\\\") if d == dl.SPARK else pat

#: Replacement tokens: stable, grep-able, never re-match any detector.
PII_MASKS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def redact_expr(col: str, d: str) -> str:
    """Nested regexp_replace masking every PII_PATTERNS match in ``col``."""
    expr = col
    for kind, pat in PII_PATTERNS.items():
        expr = dl.regex_replace_all(expr, sql_pattern(pat, d), PII_MASKS[kind], d)
    return expr


def _pii_scan(d: str) -> str:
    """Per-document PII counts + redacted text (see module docstring for
    why a deterministic contact line is planted first)."""
    plant = (
        "text || ' contact user' || CAST(doc_id AS STRING)"
        " || '@example.com or ' || CAST(200 + doc_id % 800 AS STRING)"
        " || '-555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        " || ' from 10.' || CAST(doc_id % 256 AS STRING)"
        " || '.' || CAST((doc_id * 7) % 256 AS STRING)"
        " || '.' || CAST((doc_id * 13) % 256 AS STRING)"
    )
    counts = ",\n               ".join(
        f"{dl.regex_count('txt', sql_pattern(pat, d), d)} AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    return textwrap.dedent(f"""
        WITH planted AS (
            SELECT doc_id, {plant} AS txt FROM documents
        )
        SELECT doc_id,
               {counts},
               {redact_expr("txt", d)} AS redacted
        FROM planted
    """)


register_sql(
    "pii_scan",
    _pii_scan,
    doc="PII detection + redaction (email/phone/IPv4): pure regexp "
    "projection, codegen-only, value-oracled on planted deterministic PII.",
    bench=True,
)
