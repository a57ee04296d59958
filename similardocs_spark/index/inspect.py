"""Index inspection tools — the CLI debug surface of the reference:
ShowTotalHits (per-term counts), IdSearch/ShowLastModified (doc-state lookup),
SearchExplain (per-token hit counts, OR/AND totals), IndexTest (sanity).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textnorm import analyze, uniform_text


def show_total_hits(engine) -> DataFrame:
    """All terms with their global df, ordered by term
    (ShowTotalHits.scala:49-75)."""
    return engine._terms.orderBy("term").select("term", "df")


def id_search(engine, conv_id: str) -> list:
    """Stored-fields lookup by external id (IdSearch.scala:20-23)."""
    return (
        engine._docs.filter(F.col("conv_id") == conv_id)
        .select("doc_id", "conv_id", "update_date", "db", "instance", "dl", "dlq")
        .collect()
    )


def search_explain(engine, text: str) -> dict:
    """Per-token hit counts + OR/AND totals (SearchExplain.scala:25-148)."""
    tokens = analyze(" ".join(uniform_text(text)))
    per_token = {}
    dfs = engine._term_df or {}
    for t in tokens:
        if engine._term_df is not None:
            per_token[t] = dfs.get(t, 0)
        else:
            per_token[t] = (
                engine._terms.filter(F.col("term") == t).select("df").collect() or [[0]]
            )[0][0]
    prep = engine.prepare(text)
    or_total = 0
    and_total = 0
    if prep is not None:
        w_idf, _ = prep
        if w_idf:
            decoded = engine._postings.filter(
                F.col("term").isin(sorted(w_idf))
            ).select("term", "df_seg")
            counts = decoded.groupBy().agg(F.sum("df_seg")).collect()[0][0]
            or_total = int(counts or 0)
            and_total = _and_total(engine, sorted(w_idf))
    return {"tokens": per_token, "or_total_postings": or_total, "and_total_docs": and_total}


def _and_total(engine, terms: list[str]) -> int:
    """#docs containing ALL query terms (the reference's AND probe)."""
    from ..query.engine import _decode_udf

    decoded = (
        engine._postings.filter(F.col("term").isin(terms))
        .select("term", F.explode(_decode_udf(F.col("blob"))).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .count()
    )
    return int(decoded)


def index_test(engine, term: str = "dengue") -> int:
    """Index sanity probe (IndexTest.scala:19-76): n_docs > 0 and term df."""
    assert engine.n_docs > 0
    if engine._term_df is not None:
        return engine._term_df.get(analyze(term)[0] if analyze(term) else term, 0)
    rows = engine._terms.filter(F.col("term") == term).collect()
    return rows[0]["df"] if rows else 0
