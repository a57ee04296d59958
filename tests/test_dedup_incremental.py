"""Incremental near-dedup: new batches vs stored corpus signature state.

Reference parity note: the reference updates its dedup-relevant state
incrementally through the Lucene index add/update path (LuceneIndexMain /
WebUpdaterService); operators/dedup_incremental.py is that ingestion
contract applied to the MinHash signature state."""
import pytest

LONG = (
    "zika dengue fever outbreak tropical region report alpha bravo "
    "charlie delta echo foxtrot golf hotel india"
)
OTHER = (
    "completely unrelated subject matter discussed here often with many "
    "additional distinct tokens appended for shingle volume everywhere"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
def test_pairs_against_matches_batch_operator_minus_corpus_pairs(spark):
    """pairs_against == minhash_lsh_pairs on the union, minus pairs whose
    BOTH sides are corpus docs (same banding, same buckets)."""
    from similardocs_spark.operators import dedup, dedup_incremental as inc

    corpus = _docs(
        spark,
        [(1, LONG + " one"), (2, OTHER + " two"), (3, LONG + " ones")],
    )
    batch = _docs(
        spark,
        [
            (10, LONG + " oner"),  # near corpus 1/3
            (11, OTHER + " twos"),  # near corpus 2
            (12, OTHER + " twosy"),  # near corpus 2 AND batch 11
        ],
    )
    corpus_sig = inc.signatures_for(corpus)
    got = {
        tuple(r)
        for r in inc.pairs_against(batch, corpus_sig).collect()
    }
    union_pairs = {
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            corpus.unionByName(batch)
        ).collect()
    }
    corpus_ids = {1, 2, 3}
    expect = {
        (a, b)
        for a, b in union_pairs
        if not (a in corpus_ids and b in corpus_ids)
    }
    assert got == expect
    assert got, "fixture must produce pairs"
    assert all(a not in corpus_ids or b not in corpus_ids for a, b in got)
    # and the batch operator DID find corpus-corpus pairs this one must skip
    assert any(a in corpus_ids and b in corpus_ids for a, b in union_pairs)


@pytest.mark.spark
def test_pairs_against_estimate_and_narrowing(spark):
    """jaccard_est rides the union signature table; a corpus table written
    at n=16 serves a narrower n_hashes=8 query; too-narrow state fails."""
    from similardocs_spark.operators import dedup_incremental as inc

    corpus = _docs(spark, [(1, LONG + " one"), (2, OTHER + " two")])
    batch = _docs(spark, [(10, LONG + " oner")])
    sig16 = inc.signatures_for(corpus, n_hashes=16)

    rows = inc.pairs_against(
        batch, sig16, n_hashes=8, n_bands=4, estimate_jaccard=True
    ).collect()
    assert rows and all(0.0 <= r["jaccard_est"] <= 1.0 for r in rows)

    kept = inc.pairs_against(
        batch, sig16, n_hashes=8, n_bands=4, min_jaccard=1.01
    ).count()
    assert kept == 0

    sig8 = inc.signatures_for(corpus, n_hashes=8)
    with pytest.raises(ValueError, match="mh8"):
        inc.pairs_against(batch, sig8, n_hashes=16).count()


@pytest.mark.spark
def test_accept_batch_id_order_agnostic(spark):
    """A new doc near a corpus doc is rejected even when every corpus id
    sorts ABOVE the batch ids; in-batch pairs drop the higher id; state
    rows cover accepted docs only."""
    from similardocs_spark.operators import dedup_incremental as inc

    corpus = _docs(spark, [(100, LONG + " one"), (200, OTHER + " two")])
    batch = _docs(
        spark,
        [
            (10, LONG + " ones"),  # near corpus 100 (higher id) → rejected
            (11, "argon boron carbon dalton erbium fluorine gallium "
                 "helium iodine krypton lithium marble neon oxygen"),
            (12, "argon boron carbon dalton erbium fluorine gallium "
                 "helium iodine krypton lithium marble neon oxygens"),
            # 11/12 near each other → 12 rejected
            (13, "unique text having nothing shared with anything else "
                 "platypus wombat echidna kookaburra cassowary dingo"),
        ],
    )
    accepted, pairs, state = inc.accept_batch(
        batch, inc.signatures_for(corpus)
    )
    got = {r["doc_id"] for r in accepted.collect()}
    assert got == {11, 13}
    assert {r["doc_id"] for r in state.collect()} == {11, 13}
    pair_set = {tuple(r) for r in pairs.select("doc_a", "doc_b").collect()}
    assert (10, 100) in pair_set
    assert (11, 12) in pair_set


@pytest.mark.spark
def test_accept_batch_collapses_exact_in_batch_dups(spark):
    from similardocs_spark.operators import dedup_incremental as inc

    corpus = _docs(spark, [(1, OTHER)])
    batch = _docs(spark, [(10, LONG), (11, LONG), (12, LONG)])
    accepted, _pairs, state = inc.accept_batch(batch, inc.signatures_for(corpus))
    assert {r["doc_id"] for r in accepted.collect()} == {10}
    assert {r["doc_id"] for r in state.collect()} == {10}


@pytest.mark.spark
def test_oversized_buckets_against_audit(spark):
    """The combined-bucket cap is observable, never silent: with
    max_bucket=1 every shared bucket is reported and pairs are suppressed."""
    from similardocs_spark.operators import dedup_incremental as inc

    corpus = _docs(spark, [(1, LONG + " one"), (2, LONG + " ones")])
    batch = _docs(spark, [(10, LONG + " oner")])
    sig = inc.signatures_for(corpus)
    audited = inc.oversized_buckets_against(batch, sig, max_bucket=1)
    assert audited.count() > 0
    assert inc.pairs_against(batch, sig, max_bucket=1).count() == 0
