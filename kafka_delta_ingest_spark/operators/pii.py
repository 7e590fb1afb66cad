"""PII detection and redaction over text columns.

A training-data pipeline scrubs personally identifiable information
before anything else touches the corpus. This module implements the
common regex families — email, North-American phone, IPv4, SSN — as
pure ``regexp_count`` / ``regexp_replace`` expressions: whole-stage
codegen, zero UDFs, a single narrow projection over the scan, so the
scrub runs at full scan speed over 100 TB.

Pattern dialect: every pattern here is valid and means the same thing
in Java regex (Spark) and RE2 (DuckDB) — ASCII classes, bounded
quantifiers, ``\\b`` word boundaries, non-capturing groups only. That
keeps the DuckDB oracle bit-for-bit comparable. Redaction applies the
families in a fixed order (email, ssn, phone, ipv4) so overlapping
matches resolve identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered (name, pattern, replacement). Order matters for redaction:
# email first (its local part may contain digits/dots that the later
# numeric patterns could nibble at), then SSN before phone (both are
# dash-separated digit runs; SSN's 3-2-4 shape must not be consumed by
# a partial phone match), IPv4 last.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IPV4>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-family match counts (codegen ``regexp_count``)."""
    return {
        name: F.regexp_count(col, F.lit(pattern))
        for name, pattern, _ in PII_PATTERNS
    }


def redact(col: Column) -> Column:
    """Replace every PII match with its family token, in the fixed
    PII_PATTERNS order."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_email, n_ssn, n_phone, n_ipv4, pii_total, redacted).

    Counts are measured on the ORIGINAL text (before any replacement),
    so families whose matches overlap each count the raw occurrences.
    """
    text = F.col(text_col)
    counts = pii_counts(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("pii_total"),
        redact(text).alias("redacted"),
    )
