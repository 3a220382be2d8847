"""PII detection and redaction for training-data curation.

Scans document text for personally-identifiable patterns (emails, IPv4
addresses, phone-like digit runs) and rewrites them to typed placeholder
tokens — the standard pre-training privacy scrub (e.g. the BigScience ROOTS
pipeline's PII step).

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB): no lookarounds, no backreferences — so detection and
redaction are bit-identical cross-engine and the operator is fully
oracle-checkable. Everything is `pyspark.sql.functions` expression work:
whole-stage codegen, no UDFs, no shuffle (a pure per-row projection — at
100 TB this is a map-only pass that pushes down beneath any later join).

Redaction order matters and is fixed: emails first (their domain part
could otherwise be clipped by the phone pattern), then IPv4 (dotted quads
are NOT phone numbers), then phones over the already-scrubbed text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER IS THE REDACTION ORDER.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_counts(text: Column | str) -> list[Column]:
    """One count column per PII type (`n_email`, `n_ipv4`, `n_phone`).

    Counts are measured on the PROGRESSIVELY REDACTED text, exactly like
    :func:`redact_text` — so an email's digits are never double-counted as
    a phone, and counts + redaction tell one consistent story."""
    c = F.col(text) if isinstance(text, str) else text
    out = []
    for name, pat, repl in PII_PATTERNS:
        out.append(F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, repl)
    return out


def redact_text(text: Column | str) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, has_pii, redacted_hash) per doc.

    `redacted_hash` is the md5 of the redacted text: it value-checks the
    whole rewrite without shipping document bodies into results."""
    counts = pii_counts(text_col)
    out = docs.select(F.col(id_col), *counts, F.md5(redact_text(text_col)).alias("redacted_hash"))
    has = (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    return out.withColumn("has_pii", has).select(
        id_col, "n_email", "n_ipv4", "n_phone", "has_pii", "redacted_hash"
    )


def sql_pii_scan(doc_expr: str = "text") -> dict[str, str]:
    """DuckDB twins: {'n_email': expr, ..., 'redacted': expr} over
    `doc_expr`, applying the same progressive-redaction order."""
    c = doc_expr
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = f"len(regexp_extract_all({c}, '{pat}'))"
        c = f"regexp_replace({c}, '{pat}', '{repl}', 'g')"
    counts["redacted"] = c
    return counts
