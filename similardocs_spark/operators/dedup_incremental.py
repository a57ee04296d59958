"""Incremental near-duplicate detection: new document batches vs an
existing corpus, without re-reading (or re-shingling) the corpus.

The batch `deduplicate` / `minhash_lsh_pairs` operators (dedup.py) assume
the whole corpus is in hand. A training-data pipeline ingests continuously:
each new batch must be checked against everything already accepted, and at
100 TB the accepted corpus CANNOT be re-tokenized per batch. The contract
here mirrors the engine's index/incremental.py pattern (reference parity:
the reference's incremental updater tops up a stateful Lucene index —
SimilarDocs' WebUpdaterService / LuceneIndexMain add-documents path — and
this module is that idea applied to the dedup signature state):

  - the STATE is the MinHash signature table (doc_id, mh0..mh{n-1}) — a
    projection ~50× smaller than the texts, written once per accepted batch
    (`signatures_for`, caller persists it wherever corpus state lives);
  - `pairs_against(new_docs, corpus_sig)` computes signatures for the NEW
    batch only, bands BOTH sides (banding corpus signatures is a cheap
    projection of the stored state — no text I/O), and joins candidates
    within buckets requiring ≥1 new side: new×new and new×corpus pairs,
    never corpus×corpus (already adjudicated when those docs were accepted);
  - `accept_batch` = the two-call composition callers run per ingest tick.

The seed-i hash family (dedup._minhash_cols) is shared across configs and
widening `n_hashes` only APPENDS columns, so a corpus signature table
written at n=16 serves any future config with n_hashes ≤ 16.

Skew guards are inherited from the batch operator: the bucket cap applies
to the COMBINED (corpus ∪ new) bucket — a boilerplate text that saturated
a bucket in the corpus keeps capping it for new batches (observable via
`oversized_buckets_against`, never silent).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import (
    MAX_BUCKET,
    N_BANDS,
    N_HASHES,
    _band_buckets,
    exact_representatives,
    minhash_signatures,
)


def signatures_for(
    docs: DataFrame, text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """Signature rows (doc_id, mh0..mh{n-1}) for a batch — the state a
    caller appends to its corpus signature table after accepting the batch.
    Exact-duplicate texts within the batch are collapsed to their min-id
    representative first (identical texts are the exact-dedup operator's
    job; signature state only needs one row per distinct text)."""
    return minhash_signatures(
        exact_representatives(docs, text_col), text_col, n_hashes
    )


def _validate_sig(sig: DataFrame, n_hashes: int) -> None:
    missing = [f"mh{i}" for i in range(n_hashes) if f"mh{i}" not in sig.columns]
    if missing:
        raise ValueError(
            f"corpus signature table lacks columns {missing} — it was built "
            f"with fewer hashes than n_hashes={n_hashes}; rebuild the state "
            "or query with a smaller n_hashes (the seed-i family is shared, "
            "so narrowing is always valid)"
        )


def _pairs_from_bands(capped: DataFrame) -> DataFrame:
    """(doc_a, doc_b) with doc_a < doc_b and ≥1 new side, from capped
    (doc_id, band, key, is_new) band rows — the shared core of both
    candidate strategies."""
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.is_new") | F.col("b.is_new")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _attach_estimate(
    pairs: DataFrame,
    sig: DataFrame,
    n_hashes: int,
    min_jaccard: float | None,
) -> DataFrame:
    """jaccard_est = signature-agreement fraction, joined onto the bounded
    pair set from `sig` (which must cover every pair member)."""
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(n_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(n_hashes)],
    )
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    est = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_est", (agree / F.lit(n_hashes)).cast("double"))
        .select("doc_a", "doc_b", "jaccard_est")
    )
    if min_jaccard is not None:
        est = est.filter(F.col("jaccard_est") >= min_jaccard)
    return est


def pairs_against(
    new_docs: DataFrame,
    corpus_sig: DataFrame,
    text_col: str = "text",
    max_bucket: int = MAX_BUCKET,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    estimate_jaccard: bool = False,
    min_jaccard: float | None = None,
    new_sig: DataFrame | None = None,
    broadcast_batch: bool = True,
    corpus_bands: DataFrame | None = None,
    corpus_counts: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs with ≥1 side in the new batch.

    Output: (doc_a, doc_b[, jaccard_est]) with doc_a < doc_b; both
    new×new and new×corpus pairs are produced, corpus×corpus never is
    (those documents were already adjudicated when accepted). doc_id
    spaces must be disjoint between corpus and batch — the caller's id
    allocator owns that invariant (same contract as index ingestion).

    Scale shape (`broadcast_batch=True`, the default): a tick SHUFFLES
    O(batch + hits), never O(corpus). The batch's touched (band, key) set
    is broadcast and the corpus band rows are left-semi-joined against it
    — a broadcast-hash join, so the corpus side is STREAMED map-side (one
    columnar scan, zero corpus shuffle); only rows in buckets the batch
    touches ("hits") flow on. The combined-bucket cap is then a window
    count over the bounded hits ∪ batch set — identical pair semantics to
    the corpus-wide window, because untouched buckets can produce no pair
    with a new side. The round-5 shape (window over corpus ∪ batch —
    per-tick shuffle proportional to corpus size) is kept under
    `broadcast_batch=False` for batches so large the touched-key
    broadcast would not fit the driver.

    `corpus_bands` takes PRE-BANDED state rows (band, key, doc_id) —
    e.g. BandedDedupState, which persists banding once per accepted doc —
    skipping the per-tick re-banding projection; `corpus_counts` takes
    materialized (band, key, cnt) corpus bucket sizes, used to pre-drop
    buckets that can never pass the cap BEFORE their rows stream through
    the semi join (cnt ≥ max_bucket ⇒ combined > max_bucket). Both are
    derived from `corpus_sig` when omitted. `new_sig` lets a caller that
    already ran `signatures_for` on the batch (to append state) reuse it.

    `estimate_jaccard` / `min_jaccard` behave as in minhash_lsh_pairs:
    the signature-agreement estimator; in broadcast mode the corpus
    signatures for it are fetched by a second broadcast semi-join on the
    bounded pair-member ids (again no corpus shuffle).
    """
    if new_sig is None:
        # the batch lineage (tokenize → shingle → minhash) feeds the
        # touched-bucket broadcast AND the banded union — persist the
        # compact batch-bounded signature table so it runs once
        # (ContextCleaner unpersists when the result goes out of scope)
        new_sig = signatures_for(new_docs, text_col, n_hashes).persist()
    _validate_sig(corpus_sig, n_hashes)
    _validate_sig(new_sig, n_hashes)
    want_est = estimate_jaccard or min_jaccard is not None
    keep = ["doc_id", *[f"mh{i}" for i in range(n_hashes)]]

    if not broadcast_batch:
        sig = (
            corpus_sig.select(*keep)
            .withColumn("is_new", F.lit(False))
            .unionByName(
                new_sig.select(*keep).withColumn("is_new", F.lit(True))
            )
        )
        if want_est:
            # sig feeds band rows + both estimate joins — persist the compact
            # signature union so nothing runs twice (see minhash_lsh_pairs)
            sig = sig.persist()
        bands = _band_buckets(sig, n_hashes, n_bands).join(
            sig.select("doc_id", "is_new"), "doc_id"
        )
        capped = (
            bands.withColumn(
                "_bsz", F.count("*").over(Window.partitionBy("band", "key"))
            )
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
        pairs = _pairs_from_bands(capped)
        if not want_est:
            return pairs
        return _attach_estimate(pairs, sig, n_hashes, min_jaccard)

    new_bands = _band_buckets(new_sig, n_hashes, n_bands)
    if corpus_bands is None:
        corpus_bands = _band_buckets(
            corpus_sig.select(*keep), n_hashes, n_bands
        )
    touched = new_bands.select("band", "key").distinct()
    if corpus_counts is not None:
        # buckets whose CORPUS size alone reaches the cap can never pass the
        # combined cap once the batch adds ≥1 row — drop them from both
        # sides up front so a mega-hot boilerplate bucket's rows never even
        # stream through the semi join. corpus_counts may carry PER-TICK
        # DELTAS (multiple rows per bucket); restrict to the touched keys
        # FIRST (broadcast semi — counts streamed map-side, no corpus
        # shuffle), then sum the bounded remainder
        hot = (
            corpus_counts.join(
                F.broadcast(touched), ["band", "key"], "left_semi"
            )
            .groupBy("band", "key")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") >= max_bucket)
            .select("band", "key")
        )
        new_bands = new_bands.join(
            F.broadcast(hot), ["band", "key"], "left_anti"
        )
        touched = touched.join(F.broadcast(hot), ["band", "key"], "left_anti")
    hits = corpus_bands.select("band", "key", "doc_id").join(
        F.broadcast(touched), ["band", "key"], "left_semi"
    )
    both = new_bands.withColumn("is_new", F.lit(True)).unionByName(
        hits.withColumn("is_new", F.lit(False))
    )
    if want_est:
        # `both` feeds the window+pair subtree AND the pair-member id
        # broadcast below; bounded (batch bands + hits), so persist rather
        # than re-streaming the corpus scan
        both = both.persist()
    capped = (
        both.withColumn(
            "_bsz", F.count("*").over(Window.partitionBy("band", "key"))
        )
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )
    pairs = _pairs_from_bands(capped)
    if not want_est:
        return pairs
    pairs = pairs.persist()  # feeds member-id broadcast + estimate join
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sig_small = (
        corpus_sig.select(*keep)
        .join(F.broadcast(members), "doc_id", "left_semi")
        .unionByName(new_sig.select(*keep))
    )
    return _attach_estimate(pairs, sig_small, n_hashes, min_jaccard)


def oversized_buckets_against(
    new_docs: DataFrame,
    corpus_sig: DataFrame,
    text_col: str = "text",
    max_bucket: int = MAX_BUCKET,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Audit: the combined (corpus ∪ new) band buckets pairs_against would
    skip, with sizes — the no-silent-caps contract, incremental edition."""
    sig = corpus_sig.select(
        "doc_id", *[f"mh{i}" for i in range(n_hashes)]
    ).unionByName(
        signatures_for(new_docs, text_col, n_hashes).select(
            "doc_id", *[f"mh{i}" for i in range(n_hashes)]
        )
    )
    return (
        _band_buckets(sig, n_hashes, n_bands)
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def edgewise_survivors(pairs: DataFrame, new_ids: DataFrame) -> DataFrame:
    """Batch doc_ids surviving edge-wise rejection: a pair against the
    corpus drops the new side, an in-batch pair drops the higher id.
    Id-order-agnostic (keys on WHICH side is new, not on id order); shared
    by accept_batch and the banded state's phased tick (which checkpoints
    `pairs` first so this derivation is a cheap re-read)."""
    flagged = pairs.join(
        new_ids.select(
            F.col("doc_id").alias("doc_a"), F.lit(True).alias("_a_new")
        ),
        "doc_a",
        "left",
    ).join(
        new_ids.select(
            F.col("doc_id").alias("doc_b"), F.lit(True).alias("_b_new")
        ),
        "doc_b",
        "left",
    )
    rejected = flagged.select(
        F.when(F.col("_a_new") & F.col("_b_new").isNull(), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("doc_id")
    ).distinct()
    return new_ids.join(rejected, "doc_id", "left_anti")


def accept_batch(
    new_docs: DataFrame,
    corpus_sig: DataFrame,
    text_col: str = "text",
    min_jaccard: float | None = None,
    max_bucket: int = MAX_BUCKET,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    broadcast_batch: bool = True,
    corpus_bands: DataFrame | None = None,
    corpus_counts: DataFrame | None = None,
    new_sig: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingest tick: returns (accepted_docs, pairs, new_state_rows).

    accepted_docs = new batch minus every doc with a near-match in the
    corpus, minus the higher-id side of every in-batch pair (edge-wise
    rejection: unlike `deduplicate`'s connected components it keeps two
    batch docs that BOTH match a third but not each other — correct for
    threshold similarity, which is not transitive); pairs = the evidence
    (doc_a < doc_b, with jaccard_est when min_jaccard gates);
    new_state_rows = signature rows for the ACCEPTED docs only — append
    these to the corpus signature table after committing the batch. Exact
    in-batch duplicates are also dropped (signatures_for collapses them;
    the collapsed ids never reach the survivor set). Corpus ids may sort
    above or below batch ids — rejection keys on WHICH side is new, not
    on id order.
    """
    if new_sig is None:
        new_sig = signatures_for(new_docs, text_col, n_hashes)
    pairs = pairs_against(
        new_docs,
        corpus_sig,
        text_col,
        max_bucket=max_bucket,
        n_hashes=n_hashes,
        n_bands=n_bands,
        min_jaccard=min_jaccard,
        new_sig=new_sig,
        broadcast_batch=broadcast_batch,
        corpus_bands=corpus_bands,
        corpus_counts=corpus_counts,
    )
    survivors = edgewise_survivors(pairs, new_sig.select("doc_id"))
    accepted = new_docs.join(survivors, "doc_id", "left_semi")
    state = new_sig.join(survivors, "doc_id", "left_semi")
    return accepted, pairs, state
