"""PII detection and redaction over document text — the privacy pass of a
training-data pipeline (C4 and most production corpora strip or mask
emails, IPs, and long ID numbers before training).

Pure JVM regexp plan: counts are `regexp_extract_all` sizes, redaction is
a chain of `regexp_replace` — one projection, no shuffle, no Python, so
the pass rides the same scan as any other row-local stat at 100 TB.

Pattern dialect: every pattern below is valid and IDENTICAL in meaning
for Java's regex engine (Spark) and RE2 (DuckDB oracle) — no
backreferences, no lookaround, ASCII word boundaries only. That overlap
is what makes the operator oracle-checkable; fancier patterns (e.g.
lookbehind-based phone heuristics) would be Java-only and are
deliberately out of scope.

Reference parity: the reference engine has no privacy pass; this is part
of the training-data surface the graft adds beyond the reference
(COVERAGE.md).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_stats", "pii_redact"]

# order matters for redaction: emails first (an email contains digit runs),
# then IPs (dotted digits), then bare long digit runs
PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("id_number", r"\b\d{9,}\b"),
)


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per doc: match count per PII class + `has_pii`.

    Output: (doc_id, n_email, n_ipv4, n_id_number, has_pii)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # regexp_count: same match iteration as regexp_extract_all without
    # materializing the matched strings as a per-row array
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    out = docs.select("doc_id", *counts)
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redacted copy of the text: every match replaced by `<CLASS>`
    (e.g. `<EMAIL>`), classes applied in PII_PATTERNS order so an email's
    digits are consumed before the bare-digit-run rule sees them.

    Output: (doc_id, text) with the redacted text under the SAME column
    name — drop-in for downstream operators."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    for name, pat in PII_PATTERNS:
        t = F.regexp_replace(t, pat, f"<{name.upper()}>")
    return docs.select("doc_id", t.alias(text_col))
