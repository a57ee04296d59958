"""ANSI-SQL (DuckDB) generators mirroring the engine's semantics.

Used by __spark_entry__.oracle_sql(): every SQL fragment here replicates, in
plain SQL, exactly what the Spark engine computes, so the driver's side-by-side
DuckDB comparison is a true correctness gate. The driver's `documents` table is
pure ASCII [a-z0-9 ] text, so the full analyzer chain reduces to: split on
spaces → drop stopwords → len>=3 → prefix-6 → per-doc distinct (Unicode paths
are covered separately by pytest against the pure-Python spec).
"""
from __future__ import annotations

from ..bm25 import B, K1
from ..stopwords import ALL
from ..textnorm import MAX_NGRAM, MIN_NGRAM

# stopwords that can ever match an ASCII [a-z0-9]+ token
_ASCII_STOPS = sorted(w for w in ALL if w and " " not in w and w.isascii())


def stopword_cte() -> str:
    vals = ", ".join(f"('{w}')" for w in _ASCII_STOPS)
    return f"stop(w) AS (VALUES {vals})"


def tokens_cte(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """toks(doc_id, term): per-doc DISTINCT prefix tokens of ASCII text."""
    return f"""toks AS (
      SELECT {id_col} AS doc_id, term FROM (
        SELECT DISTINCT {id_col}, t[1:{MAX_NGRAM}] AS term
        FROM (
          SELECT {id_col}, unnest(string_split_regex(trim({text_col}), ' +')) AS t
          FROM {table}
        )
        WHERE len(t) >= {MIN_NGRAM} AND t NOT IN (SELECT w FROM stop)
      )
    )"""


def dlq_sql(expr: str) -> str:
    """Lucene SmallFloat 1-byte norm round-trip (bm25.quantize_dl) as SQL:
    v = dl - 24; dl < 24 → dl; else 24 + ((v >> s) << s), s = bit_length(v) - 4
    (CASE ladder avoids float log2 edge cases)."""
    v = f"({expr} - 24)"
    shift = "CASE " + " ".join(
        f"WHEN {v} < {1 << (k + 4)} THEN {k}" for k in range(0, 28)
    ) + " ELSE 28 END"
    return (
        f"CASE WHEN {expr} < 24 THEN {expr} "
        f"ELSE 24 + (({v} >> ({shift})) << ({shift})) END"
    )


def idf_sql(df_expr: str, n_docs_expr: str) -> str:
    """float32(ln(1 + (N - df + 0.5)/(df + 0.5)))."""
    return f"CAST(ln(1.0 + ({n_docs_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5)) AS REAL)"


def tfnorm_sql(dlq_expr: str, avgdl_expr: str) -> str:
    """float32(1 / (1 + k1*(1 - b + b*dlq/avgdl)))."""
    return (
        f"CAST(1.0 / (1.0 + {K1} * ({1.0 - B} + {B} * {dlq_expr} / {avgdl_expr})) AS REAL)"
    )


def qterms_cte(weights: dict[str, int]) -> str:
    """q(term, w): the prepared query-term multiset (term weights)."""
    vals = ", ".join(f"('{t}', {w})" for t, w in sorted(weights.items()))
    return f"q(term, w) AS (VALUES {vals})"


def qtokens_cte(tokens: list[str]) -> str:
    """qtok(term): the query rerank token set."""
    vals = ", ".join(f"('{t}')" for t in sorted(set(tokens)))
    return f"qtok(term) AS (VALUES {vals})"
