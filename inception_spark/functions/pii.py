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

Counting and redaction share ONE pass order (email, card, ssn, phone,
ipv4): each category is counted against the text with all
higher-priority categories already redacted, then redacted itself.
This makes ``n_pii`` exactly the number of placeholders in ``redacted``
even when spans overlap across categories — e.g. a 16-digit card number
used as an email local-part ("1234-5678-9012-3456@x.co") is ONE email,
not an email plus a card (counting both against the original text
overcounted; advisor finding, round 2).  Within a category, matches are
non-overlapping by regex semantics.
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

    Counts are staged: category N is counted on the text with categories
    1..N-1 already redacted, so the counts sum to the exact number of
    placeholders in ``redacted`` (see module docstring).  Still one
    narrow projection — Catalyst collapses the staged extract-alls and
    the redact chain into a single whole-stage-codegen map over the
    scan; no shuffle, safe at any scale.
    """
    stage = F.col(text_col)
    counts: dict[str, Column] = {}
    for cat, pat in PII_PATTERNS.items():
        counts[f"n_{cat}"] = F.size(
            F.regexp_extract_all(stage, F.lit(pat), F.lit(0))
        ).cast("bigint")
        stage = F.regexp_replace(stage, pat, PII_PLACEHOLDERS[cat])
    total = None
    for v in counts.values():
        total = v if total is None else total + v
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in counts.items()],
        total.cast("bigint").alias("n_pii"),
        (total > 0).alias("has_pii"),
        stage.alias("redacted"),
    )


def pii_stats_sql(table: str = "documents", *, id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """DuckDB twin of pii_stats — same staged counting order."""
    stage = text_col
    counts: dict[str, str] = {}
    for cat, pat in PII_PATTERNS.items():
        counts[f"n_{cat}"] = pii_count_sql(stage, cat)
        stage = f"regexp_replace({stage}, '{pat}', '{PII_PLACEHOLDERS[cat]}', 'g')"
    total = " + ".join(counts.values())
    cols = ",\n       ".join(f"{v} AS {k}" for k, v in counts.items())
    return f"""
SELECT {id_col},
       {cols},
       CAST({total} AS BIGINT) AS n_pii,
       ({total}) > 0 AS has_pii,
       {stage} AS redacted
FROM {table}
"""
