"""PII detection and redaction for training-data pipelines.

A training corpus scrubber needs two primitives: *count* PII occurrences
per document (for filtering/reporting) and *redact* them (replace each
match with a typed placeholder).  Both are pure regexp column expressions
— whole-stage codegen JVM-side, no Python in the hot path, no shuffle —
so they scale as a narrow projection over 100 TB of text.

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB): no lookaround, no backreferences, ASCII character classes
only.  That keeps the DuckDB oracle twin (``*_sql``) bit-identical.
The reference service has no PII surface (SURVEY.md §2.5); this extends
it per the build brief's training-data-pipeline mandate.

Counting is always done against the ORIGINAL text, independently per
category — the categories are constructed non-overlapping (anchored with
``\\b`` so e.g. a 16-digit card number cannot partially match the SSN or
phone patterns).  Redaction applies the patterns in a fixed order
(email, card, ssn, phone, ipv4); because the patterns are mutually
exclusive on any given span, the order only matters for the placeholder
a span receives, never for whether it is found.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: more-specific / longer patterns first so redaction placeholders
# land on the most specific category.  Dict order is the redaction order.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — permissive local part, 2+ letter TLD
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 16-digit payment card, 4-4-4-4 with - or space separators
    "card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    # US social security number, strictly 3-2-4
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # NANP-style phone, strictly 3-3-4 with - or . separators
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    # dotted-quad IPv4 (no range check — screening, not validation)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_PLACEHOLDERS: dict[str, str] = {
    "email": "[EMAIL]",
    "card": "[CARD]",
    "ssn": "[SSN]",
    "phone": "[PHONE]",
    "ipv4": "[IP]",
}


def pii_count(col: Column, category: str) -> Column:
    """Number of non-overlapping matches of one PII category (bigint)."""
    pat = PII_PATTERNS[category]
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("bigint")


def pii_count_sql(expr: str, category: str) -> str:
    pat = PII_PATTERNS[category]
    return f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT)"


def pii_redact(col: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    out = col
    for cat, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, PII_PLACEHOLDERS[cat])
    return out


def pii_redact_sql(expr: str) -> str:
    out = expr
    for cat, pat in PII_PATTERNS.items():
        # DuckDB regexp_replace replaces only the first match unless 'g'
        out = f"regexp_replace({out}, '{pat}', '{PII_PLACEHOLDERS[cat]}', 'g')"
    return out


def pii_stats(df, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document PII counts + redacted text + has_pii flag.

    One narrow projection — Catalyst collapses the five extract-alls and
    the redact chain into a single whole-stage-codegen map over the scan;
    no shuffle, safe at any scale.
    """
    c = F.col(text_col)
    counts = {f"n_{cat}": pii_count(c, cat) for cat in PII_PATTERNS}
    total = None
    for v in counts.values():
        total = v if total is None else total + v
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in counts.items()],
        total.cast("bigint").alias("n_pii"),
        (total > 0).alias("has_pii"),
        pii_redact(c).alias("redacted"),
    )


def pii_stats_sql(table: str = "documents", *, id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    counts = {f"n_{cat}": pii_count_sql(text_col, cat) for cat in PII_PATTERNS}
    total = " + ".join(counts.values())
    cols = ",\n       ".join(f"{v} AS {k}" for k, v in counts.items())
    return f"""
SELECT {id_col},
       {cols},
       CAST({total} AS BIGINT) AS n_pii,
       ({total}) > 0 AS has_pii,
       {pii_redact_sql(text_col)} AS redacted
FROM {table}
"""
