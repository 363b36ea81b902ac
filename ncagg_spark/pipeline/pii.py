"""PII scrubbing for training-data pipelines: redact emails, IPv4
addresses, SSN-style ids, credit-card-style numbers, and US-style phone
numbers from a text column.

Pure Catalyst `regexp_replace` / `regexp_extract_all` chains — no Python
UDFs — so a 100 TB corpus scrub is a single whole-stage-codegen scan.
Patterns are written in the common Java-regex / RE2 subset (no
lookaround, no backrefs) so the DuckDB oracle twin (`sql_redact_pii`,
`sql_pii_counts`) runs the EXACT same patterns; replacement order is
fixed and part of the contract (e.g. credit cards are replaced before
the looser phone pattern can see them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (tag, pattern) in replacement order. Patterns deliberately stay in the
# Java-regex ∩ RE2 subset; \b is the ASCII word boundary in both.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("CC", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b|\b\d{16}\b"),
    # the area code anchors with \b (or an explicit paren) so the tail
    # of a longer digit run ("order #99123 456-7890") is not mangled
    (
        "PHONE",
        r"(?:\+\d{1,2}[ .-])?(?:\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b",
    ),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Replace each PII match with ``<TAG>`` (fixed pattern order)."""
    out = _c(col)
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (pre-redaction), keyed by lowercase tag.

    Counts are taken against the ORIGINAL text for every pattern, so a
    phone-shaped substring inside a credit-card number counts for both;
    `redact_pii` (sequential) is authoritative for what survives.
    """
    c = _c(col)
    return {
        tag.lower(): F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for tag, pat in PII_PATTERNS
    }


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def sql_redact_pii(expr: str) -> str:
    """DuckDB twin of `redact_pii` (RE2; 'g' = replace all)."""
    out = expr
    for tag, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{_sql_quote(pat)}', '<{tag}>', 'g')"
    return out


def sql_pii_counts(expr: str) -> dict[str, str]:
    """DuckDB twin of `pii_counts`."""
    return {
        tag.lower(): f"len(regexp_extract_all({expr}, '{_sql_quote(pat)}'))"
        for tag, pat in PII_PATTERNS
    }
