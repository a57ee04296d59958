"""Incremental embedding near-dup detection: new vector batches vs an
existing corpus, mirroring operators/dedup_incremental.py for the
embedding modality.

State is the ACCEPTED embeddings enriched with their LSH artifacts —
per-table hyperplane buckets (b0..b{tables-1}) and the vector norm —
so per ingest tick the corpus side is read as-is: no re-projection
(the matmul bucket UDF runs over the new batch only), no norm
recompute, and (broadcast-batch strategy, the default) no corpus
shuffle — the state is STREAMED through broadcast semi-joins on the
batch's touched buckets and on the bounded pair-member ids, so a tick
shuffles O(batch + hits) rows regardless of corpus size. Unlike the text case the vectors themselves must live in
state anyway (exact cosine verification needs them), so the win is
compute + the ingestion CONTRACT: new×corpus and new×new candidates
only, never corpus×corpus, with the same bucket-cap observability and
every emitted pair exactly verified.

The LSH configuration (dim, bits, tables, seed) is stamped into the
bucket columns' field metadata — Spark persists field metadata through
parquet — and `pairs_against` fails fast on a mismatched or missing
config instead of silently joining buckets from different hash families.

SIZE `bits` TO THE CORPUS (`ann.lsh_bits_for`): per-tick corpus work is
the rows in buckets the batch touches ≈ expected_bucket_size × touched
buckets — corpus-INDEPENDENT only while expected bucket size is held
~constant. At a fixed bits the tick degrades to O(corpus) as the corpus
outgrows its 2^bits bucket space (measured: bits=14, 300k→3M vectors,
broadcast-strategy shuffle 256→3883 MB and slower than the window —
scripts/ann_inc_scale.py), so when the corpus grows ~10× past its
bootstrap sizing, re-band the state with more bits at a compaction
(one projection pass; cheaper than every tick paying the full corpus).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ann import _dot, _norm, hyperplanes, infer_dim, lsh_bucket_col


def _resolve_dim(
    dim: int | None, corpus_state: DataFrame | None, batch: DataFrame, vec_col: str
) -> int:
    """Per-tick dim resolution WITHOUT a per-tick probe job: explicit `dim`
    wins; else the LSH config stamped into the corpus state's b0 field
    metadata (state_for writes it; parquet persists it) — zero extra jobs;
    only a metadata-less state (or a bootstrap with no state) falls back to
    one bounded null-safe probe of the batch."""
    if dim is not None:
        return dim
    if corpus_state is not None and "b0" in corpus_state.columns:
        meta = corpus_state.schema["b0"].metadata
        if meta and meta.get("dim") is not None:
            return int(meta["dim"])
    return infer_dim(batch, vec_col)


def _resolve_config(
    corpus_state: DataFrame | None,
    bits: int | None,
    tables: int | None,
    seed: int | None,
) -> tuple[int, int, int]:
    """Per-tick LSH-config resolution: explicit argument wins; else the
    config stamped into the corpus state's b0 field metadata (state_for
    writes it; parquet persists it); else the small-corpus defaults
    (6, 2, 42). Lets a caller bootstrap with `bits=lsh_bits_for(n)` once
    and run every tick as plain `pairs_against(batch, state)` — the tick
    can no longer silently disagree with the bootstrap sizing."""
    meta = None
    if corpus_state is not None and "b0" in corpus_state.columns:
        meta = corpus_state.schema["b0"].metadata or None

    def pick(v: int | None, k: str, d: int) -> int:
        if v is not None:
            return v
        if meta and meta.get(k) is not None:
            return int(meta[k])
        return d

    return pick(bits, "bits", 6), pick(tables, "tables", 2), pick(
        seed, "seed", 42
    )


def state_for(
    embeddings: DataFrame,
    dim: int | None = None,
    bits: int = 6,
    tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """State rows (id, vector, _n, b0..b{tables-1}) for a batch — what a
    caller appends to its corpus state after accepting the batch. Bucket
    columns carry the LSH config as field metadata."""
    if dim is None:
        dim = infer_dim(embeddings, vec_col)
    cols = [
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_n"),
    ]
    meta = {"dim": dim, "bits": bits, "tables": tables, "seed": seed}
    for t in range(tables):
        cols.append(
            lsh_bucket_col(
                F.col(vec_col), hyperplanes(dim, bits, seed + t)
            ).alias(f"b{t}", metadata=meta)
        )
    return embeddings.select(*cols)


def reband_state(
    state: DataFrame,
    bits: int,
    tables: int | None = None,
    seed: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Re-derive the bucket columns at a NEW config from the state's
    stored vectors — ONE projection pass (the bucket matmul UDF over the
    state; no shuffle, no re-read of source data). Run at a compaction
    when the corpus has outgrown its bootstrap `lsh_bits_for` sizing
    (module docstring: at a fixed bits, per-tick cost degrades to
    O(corpus) as expected bucket size grows with the corpus). dim and
    any unspecified config come from the old state's stamped metadata;
    subsequent ticks pick the new config up from the new metadata."""
    meta = state.schema["b0"].metadata if "b0" in state.columns else {}
    dim = int(meta["dim"]) if meta and meta.get("dim") is not None else None
    _, old_tables, old_seed = _resolve_config(state, None, None, None)
    return state_for(
        state.select(id_col, vec_col),
        dim=dim,
        bits=bits,
        tables=tables if tables is not None else old_tables,
        seed=seed if seed is not None else old_seed,
        id_col=id_col,
        vec_col=vec_col,
    )


def _validate_state(state: DataFrame, tables: int, expect: dict) -> None:
    for t in range(tables):
        name = f"b{t}"
        if name not in state.columns:
            raise ValueError(
                f"corpus state lacks bucket column {name} — it was built "
                f"with fewer tables than tables={tables}"
            )
        meta = state.schema[name].metadata
        if meta:
            got = {k: meta.get(k) for k in ("dim", "bits", "tables", "seed")}
            if any(got[k] is not None and got[k] != expect[k] for k in expect):
                raise ValueError(
                    f"corpus state column {name} was built with LSH config "
                    f"{got}, query uses {expect} — bucket ids are from "
                    "different hash families; rebuild the state or match "
                    "the config"
                )


def pairs_against(
    new_embeddings: DataFrame,
    corpus_state: DataFrame,
    threshold: float = 0.9,
    bits: int | None = None,
    tables: int | None = None,
    seed: int | None = None,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    new_state: DataFrame | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Verified near-dup pairs (vec_a, vec_b, cosine_e6) with ≥1 side in
    the new batch; vec_a < vec_b; corpus×corpus pairs never produced.
    Same scale shape as embedding_near_dup_pairs: ids-only candidate
    shuffle, per-table combined-bucket cap, exact cosine verification of
    every emitted pair. `new_state` lets a caller reuse `state_for`
    output computed for the append.

    `broadcast_batch=True` (default) mirrors dedup_incremental: the
    batch's touched buckets are broadcast per table and the corpus state
    is left-semi-joined against them — a broadcast-hash join streams the
    corpus map-side, so a tick SHUFFLES O(batch + hits) id/bucket rows
    and the verify join fetches corpus vectors by a second broadcast
    semi-join on the bounded pair-member ids, never shuffling corpus
    vectors. `broadcast_batch=False` keeps the round-5 corpus-wide window
    (per-tick shuffle proportional to corpus size) for batches too large
    to broadcast their bucket sets.

    bits/tables/seed default to the config stamped in the corpus state's
    metadata (then 6/2/42), so ticks follow the bootstrap sizing — pass
    explicitly only to override (a mismatch still fails fast)."""
    dim = _resolve_dim(dim, corpus_state, new_embeddings, vec_col)
    bits, tables, seed = _resolve_config(corpus_state, bits, tables, seed)
    expect = {"dim": dim, "bits": bits, "tables": tables, "seed": seed}
    if new_state is None:
        new_state = state_for(
            new_embeddings, dim, bits, tables, seed, id_col, vec_col
        )
    _validate_state(corpus_state, tables, expect)
    _validate_state(new_state, tables, expect)

    keep = [id_col, vec_col, "_n", *[f"b{t}" for t in range(tables)]]
    if broadcast_batch:
        pair_frames = []
        for t in range(tables):
            nb = new_state.select(
                F.col(id_col), F.col(f"b{t}").alias("bucket")
            ).filter(F.col("bucket").isNotNull())
            touched = nb.select("bucket").distinct()
            hits = (
                corpus_state.select(
                    F.col(id_col), F.col(f"b{t}").alias("bucket")
                )
                .filter(F.col("bucket").isNotNull())
                .join(F.broadcast(touched), "bucket", "left_semi")
            )
            both = nb.withColumn("is_new", F.lit(True)).unionByName(
                hits.withColumn("is_new", F.lit(False))
            )
            capped = (
                both.withColumn(
                    "_bsz", F.count("*").over(Window.partitionBy("bucket"))
                )
                .filter(F.col("_bsz") <= max_bucket)
                .drop("_bsz")
            )
            a, b = capped.alias("a"), capped.alias("b")
            pair_frames.append(
                a.join(
                    b,
                    (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                    & (F.col("a.is_new") | F.col("b.is_new")),
                ).select(
                    F.col(f"a.{id_col}").alias("vec_a"),
                    F.col(f"b.{id_col}").alias("vec_b"),
                )
            )
        cands = pair_frames[0]
        for x in pair_frames[1:]:
            cands = cands.unionByName(x)
        # feeds the member-id broadcast AND the verify join
        cands = cands.dropDuplicates(["vec_a", "vec_b"]).persist()
        members = (
            cands.select(F.col("vec_a").alias(id_col))
            .unionByName(cands.select(F.col("vec_b").alias(id_col)))
            .distinct()
        )
        vec_src = (
            corpus_state.select(*keep)
            .join(F.broadcast(members), id_col, "left_semi")
            .unionByName(new_state.select(*keep))
            .persist()  # bounded: pair members + batch; feeds va AND vb
        )
    else:
        vec_src = (
            corpus_state.select(*keep)
            .withColumn("is_new", F.lit(False))
            .unionByName(
                new_state.select(*keep).withColumn("is_new", F.lit(True))
            )
            .persist()  # feeds per-table bucket joins + the verify join
        )
        pair_frames = []
        for t in range(tables):
            bt = vec_src.select(
                F.col(id_col), F.col(f"b{t}").alias("bucket"), "is_new"
            ).filter(F.col("bucket").isNotNull())
            capped = (
                bt.withColumn(
                    "_bsz", F.count("*").over(Window.partitionBy("bucket"))
                )
                .filter(F.col("_bsz") <= max_bucket)
                .drop("_bsz")
            )
            a, b = capped.alias("a"), capped.alias("b")
            pair_frames.append(
                a.join(
                    b,
                    (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                    & (F.col("a.is_new") | F.col("b.is_new")),
                ).select(
                    F.col(f"a.{id_col}").alias("vec_a"),
                    F.col(f"b.{id_col}").alias("vec_b"),
                )
            )
        cands = pair_frames[0]
        for x in pair_frames[1:]:
            cands = cands.unionByName(x)
        cands = cands.dropDuplicates(["vec_a", "vec_b"])
    va = vec_src.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    vb = vec_src.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn(
            "cosine_e6",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
                * 1e6
            ).cast("long"),
        )
        .filter(F.col("cosine_e6") >= int(round(threshold * 1e6)))
        .select("vec_a", "vec_b", "cosine_e6")
    )


def accept_batch(
    new_embeddings: DataFrame,
    corpus_state: DataFrame,
    threshold: float = 0.9,
    bits: int | None = None,
    tables: int | None = None,
    seed: int | None = None,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    broadcast_batch: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingest tick: (accepted_embeddings, pairs, new_state_rows).
    Rejection is id-order-agnostic and edge-wise, identical to
    dedup_incremental.accept_batch: a corpus match drops the new side,
    an in-batch pair drops the higher id. LSH config defaults to the
    corpus state's stamped metadata (see pairs_against)."""
    dim = _resolve_dim(dim, corpus_state, new_embeddings, vec_col)
    bits, tables, seed = _resolve_config(corpus_state, bits, tables, seed)
    new_state = state_for(
        new_embeddings, dim, bits, tables, seed, id_col, vec_col
    )
    pairs = pairs_against(
        new_embeddings,
        corpus_state,
        threshold,
        bits,
        tables,
        seed,
        max_bucket,
        id_col,
        vec_col,
        dim,
        new_state=new_state,
        broadcast_batch=broadcast_batch,
    )
    new_ids = new_state.select(F.col(id_col).alias("doc_id"))
    flagged = pairs.join(
        new_ids.select(
            F.col("doc_id").alias("vec_a"), F.lit(True).alias("_a_new")
        ),
        "vec_a",
        "left",
    ).join(
        new_ids.select(
            F.col("doc_id").alias("vec_b"), F.lit(True).alias("_b_new")
        ),
        "vec_b",
        "left",
    )
    rejected = flagged.select(
        F.when(F.col("_a_new") & F.col("_b_new").isNull(), F.col("vec_a"))
        .otherwise(F.col("vec_b"))
        .alias(id_col)
    ).distinct()
    survivors = new_state.select(id_col).join(rejected, id_col, "left_anti")
    accepted = new_embeddings.join(survivors, id_col, "left_semi")
    state = new_state.join(survivors, id_col, "left_semi")
    return accepted, pairs, state


def oversized_buckets_against(
    new_embeddings: DataFrame,
    corpus_state: DataFrame,
    bits: int | None = None,
    tables: int | None = None,
    seed: int | None = None,
    max_bucket: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Audit: combined (corpus ∪ new) buckets pairs_against would skip,
    as (table, bucket, bucket_size) rows — no silent caps. LSH config
    defaults to the corpus state's stamped metadata (see pairs_against)."""
    dim = _resolve_dim(dim, corpus_state, new_embeddings, vec_col)
    bits, tables, seed = _resolve_config(corpus_state, bits, tables, seed)
    new_state = state_for(
        new_embeddings, dim, bits, tables, seed, id_col, vec_col
    )
    frames = []
    for t in range(tables):
        frames.append(
            corpus_state.select(F.col(f"b{t}").alias("bucket"))
            .unionByName(new_state.select(F.col(f"b{t}").alias("bucket")))
            .filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count("*").alias("bucket_size"))
            .filter(F.col("bucket_size") > max_bucket)
            .select(F.lit(t).alias("table"), "bucket", "bucket_size")
        )
    out = frames[0]
    for x in frames[1:]:
        out = out.unionByName(x)
    return out
