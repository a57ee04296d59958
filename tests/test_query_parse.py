"""Query-syntax sanitization (T14 / QueryParser edge)."""
from __future__ import annotations

import pytest

from similardocs_spark.query.parse import sanitize_query


def test_paren_strip_and_plain_words():
    assert sanitize_query("(zika dengue)") == ("zika dengue", None, None)
    assert sanitize_query("zika (dengue febre)") == ("zika dengue febre", None, None)


def test_boolean_markers_dropped():
    text, s, i = sanitize_query("zika AND dengue OR NOT febre && malaria || x")
    assert text == "zika dengue febre malaria x"
    assert s is None and i is None
    assert sanitize_query("+zika -dengue") == ("zika dengue", None, None)


def test_field_terms():
    text, s, i = sanitize_query("db:MEDLINE instance:i1 zika ti:dengue")
    assert text == "zika"  # unknown field ti: dropped whole
    assert s == {"MEDLINE"} and i == {"i1"}
    # quoted value + case-insensitive field name
    text, s, i = sanitize_query('DB:"LILACS" zika')
    assert text == "zika" and s == {"LILACS"}


def test_quotes_wildcards_escapes():
    assert sanitize_query('"zika dengue" febre*') == ("zika dengue febre", None, None)
    assert sanitize_query(r"zika\-virus") == ("zika-virus", None, None)
    # fuzzy/boost/range syntax chars become separators; TO survives as a
    # plain word and dies in the analyzer's stopword/length gates downstream
    assert sanitize_query("te~2 ra^4 [a TO b]") == ("te 2 ra 4 a TO b", None, None)


def test_empty_and_degenerate():
    assert sanitize_query("") == ("", None, None)
    assert sanitize_query("AND OR NOT") == ("", None, None)
    assert sanitize_query("db:") == ("", None, None)


@pytest.mark.spark
def test_search_parse_syntax_end_to_end(spark, tmp_path):
    from similardocs_spark.fixtures import (
        END_DAYS_AGO,
        PINNED_TODAY,
        docs_meta_for,
        make_transcripts,
        transcripts_df,
    )
    from similardocs_spark.index.build import IndexPaths, build_index
    from similardocs_spark.query.engine import SearchEngine

    turns = make_transcripts(60, seed=42)
    meta = docs_meta_for(turns)
    meta_df = spark.createDataFrame(
        [(c, m["db"], m["instance"], m["update_date"]) for c, m in meta.items()],
        "conv_id string, db string, instance string, update_date string",
    )
    root = str(tmp_path / "idx")
    build_index(spark, transcripts_df(spark, n_convs=60, seed=42), root,
                docs_meta=meta_df, seg_size=16)
    eng = SearchEngine(spark, IndexPaths(root), PINNED_TODAY, END_DAYS_AGO)

    plain = eng.search("zika dengue", sources={"MEDLINE"})
    parsed = eng.search("(zika AND dengue) db:MEDLINE", parse_syntax=True)
    assert [(r["doc_id"], r["score"]) for r in parsed] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
    # explicit argument wins over parsed filter
    override = eng.search("zika db:MEDLINE", sources={"LILACS"}, parse_syntax=True)
    assert override == eng.search("zika", sources={"LILACS"})