"""PII scrubbing for training-data pipelines — map-only, JVM-side.

A corpus headed for model training needs emails, phone numbers, IP
addresses, and long account-number-like digit runs replaced with typed
placeholders BEFORE any downstream dedup/packing (the reference engine
has no text hygiene at all; this is part of the LLM-data-pipeline
surface this engine adds on top of its operator set).

Scale shape: one `select` of regexp expressions — no shuffle, no UDF,
no Python on the hot path; whole-stage codegen keeps it inside the scan
stage, so at 100 TB it is exactly as parallel as the input split count.

Pattern dialect is deliberately restricted to the Java-regex/RE2 common
subset (char classes, bounded quantifiers, \\b word boundaries) so the
DuckDB oracle replays the semantics verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii", "pii_pattern_sql"]

# (category, regex) — order matters: replacements run sequentially on
# the running text, so an email consumes its own digits before the
# ipv4/longnum passes see them. Counts are taken on the ORIGINAL text
# per category (a digit run inside an email counts for both — the
# count answers "how many did this category match", not "how many
# placeholders landed").
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("longnum", r"\b\d{9,}\b"),
)


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Redact PII from `text_col`.

    Returns one row per input row: id, per-category match counts
    (n_email, n_ipv4, n_phone, n_longnum), the redacted text
    (`scrubbed`, placeholders like <EMAIL>), and `n_redacted` (total
    matches consumed by the sequential replacement — counted on the
    running text, so overlaps are attributed to the earliest category).
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    red: Column = F.col(text_col)
    total = F.lit(0)
    for name, pat in PII_PATTERNS:
        total = total + F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        *counts,
        total.alias("n_redacted"),
        red.alias("scrubbed"),
    )


def pii_pattern_sql(text_expr: str) -> tuple[str, str]:
    """DuckDB twins of the Spark expressions (dual-dialect builder,
    same convention as functions/text.py): returns (count_select_list,
    scrubbed_expr) over `text_expr`. DuckDB regexp_replace needs the
    'g' flag for replace-all; counts use len(regexp_extract_all)."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    red = text_expr
    totals = []
    for name, pat in PII_PATTERNS:
        totals.append(f"len(regexp_extract_all({red}, '{pat}'))")
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    count_list = counts + ", " + " + ".join(totals) + " AS n_redacted"
    return count_list, red
