"""Explain mode, render shapes, index inspection tools."""
from __future__ import annotations

import pytest

from similardocs_spark.fixtures import END_DAYS_AGO, PINNED_TODAY, transcripts_df
from similardocs_spark.index.build import IndexPaths, build_index
from similardocs_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("insidx"))
    build_index(spark, transcripts_df(spark, n_convs=50, seed=42), root, seg_size=16)
    return SearchEngine(spark, IndexPaths(root), PINNED_TODAY, END_DAYS_AGO)


@pytest.mark.spark
def test_explain_mode(engine):
    hits = engine.search("zika dengue", explain=True)
    assert hits
    h = hits[0]
    original, similar, common = h.ngrams
    assert set(common) == set(original) & set(similar)
    assert len(common) == h.n_common
    assert "zika" in original and "dengue" in original


@pytest.mark.spark
def test_render_xml_json(engine):
    from similardocs_spark.query.render import doc2json, doc2xml, hits_to_xml

    hits = engine.search("zika dengue", explain=True)
    xml = hits_to_xml(engine, "zika dengue", hits, explain=True)
    assert xml.startswith('<?xml version="1.0"')
    assert f'total="{len(hits)}"' in xml
    assert "<original_ngrams>" in xml and "<common_ngrams>" in xml

    js = doc2json([(1.5, {"id": ["a"], "ti": ["x", "y"]})])
    assert js == '{"documents":[{"score":1.5,"id":"a","ti":["x","y"]}]}'
    x = doc2xml([(2.0, {"decs": ["a & b"]}, None)])
    assert "a &amp; b" in x


@pytest.mark.spark
def test_inspect_tools(engine):
    from similardocs_spark.index.inspect import (
        id_search,
        index_test,
        search_explain,
        show_total_hits,
    )

    terms = show_total_hits(engine).collect()
    assert len(terms) > 10
    assert terms == sorted(terms, key=lambda r: r["term"])

    rows = id_search(engine, "conv00000003")
    assert len(rows) == 1 and rows[0]["doc_id"] >= 0

    ex = search_explain(engine, "zika dengue xyzzynotfound")
    assert ex["tokens"]["zika"] > 0
    assert ex["tokens"].get("xyzzyn", 0) == 0
    assert ex["or_total_postings"] >= ex["and_total_docs"] > 0

    assert index_test(engine, "dengue") > 0
