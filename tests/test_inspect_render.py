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


@pytest.mark.spark
def test_term_search_show_docs_new_ids(engine):
    from similardocs_spark.index.inspect import (
        show_docs,
        show_new_doc_ids,
        term_search,
    )

    # postings probe: term df must equal the id list length (small index)
    got = term_search(engine, "term", "dengue")
    assert got["hits"] == len(got["doc_ids"]) > 0
    assert got["doc_ids"] == sorted(got["doc_ids"])
    # stored-field probe
    byconv = term_search(engine, "conv_id", "conv00000003")
    assert byconv["hits"] == 1

    one = show_docs(engine, doc_id=byconv["doc_ids"][0])
    assert len(one) == 1 and one[0]["conv_id"] == "conv00000003"
    alldocs = show_docs(engine)
    assert len(alldocs) == 50
    assert [r["doc_id"] for r in alldocs] == sorted(r["doc_id"] for r in alldocs)

    recent = show_new_doc_ids(engine, days=100_000)
    assert recent and all(r["update_date"] <= "99999999" for r in recent)
    assert len(recent) >= len(show_new_doc_ids(engine, days=30))


@pytest.mark.spark
def test_iterate_documents_pagination(engine):
    from similardocs_spark.index.inspect import iterate_documents, show_docs

    pages = list(iterate_documents(engine, page_size=7))
    assert [r["doc_id"] for r in pages] == sorted(r["doc_id"] for r in pages)
    assert len(pages) == 50
    assert [r["doc_id"] for r in pages] == [r["doc_id"] for r in show_docs(engine)]
    assert [r["conv_id"] for r in iterate_documents(engine, page_size=1000)] == [
        r["conv_id"] for r in pages
    ]


def test_ngram_text_scalar():
    from similardocs_spark.functions.ngram_text import ngram_text, token_stream

    # 'dengue' appears 3×, 'zika' 2×, 'febre' 1× — rank by freq then first pos
    text = "Dengue zika dengue febre ZIKA dengue"
    assert token_stream(text) == ["dengue", "zika", "dengue", "febre", "zika", "dengue"]
    assert ngram_text(text, 2) == "dengue zika"
    assert ngram_text(text, 10) == "dengue zika febre"
    assert ngram_text("the and of", 3) is None  # all stopwords → None
    assert ngram_text("", 3) is None
    # prefix-6 truncation + tie broken by first occurrence
    assert ngram_text("calamidade zumbido calamares", 3) == "calami zumbid calama"


@pytest.mark.spark
def test_ngram_text_col(spark):
    from similardocs_spark.functions.ngram_text import ngram_text, ngram_text_col

    docs = spark.createDataFrame(
        [(1, "Dengue zika dengue febre ZIKA dengue"), (2, "the and of"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["ngram_text"] for r in ngram_text_col(docs, num_tokens=2).collect()}
    assert rows[1] == ngram_text("Dengue zika dengue febre ZIKA dengue", 2)
    assert rows[2] is None and rows[3] is None
