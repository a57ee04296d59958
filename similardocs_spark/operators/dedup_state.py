"""Persistent PRE-BANDED MinHash signature state for incremental dedup —
the storage layer under operators/dedup_incremental.py (which is pure
dataflow over caller-supplied DataFrames).

Round-5 shape: the stream re-read the whole signature table per tick and
re-derived band rows + bucket-size windows over corpus ∪ batch — per-tick
shuffle proportional to CORPUS size. This class makes a tick O(batch):

  <root>/meta/    one row (n_hashes, n_bands) — config pinned at creation;
                  opening with a different config fails fast (band keys
                  from different configs must never be joined)
  <root>/sig/     (doc_id, mh0..mh{n-1})        — SOURCE OF TRUTH
  <root>/bands/   (band, key, doc_id)            — banding, computed ONCE
                                                    per accepted doc
  <root>/counts/  (band, key, cnt)               — materialized bucket
                                                    sizes (per-tick deltas,
                                                    summed on read)

all three partitioned by `ingest_batch` (one partition per accepted tick,
plus "base" after bootstrap/compaction). Every write is a DYNAMIC PARTITION
OVERWRITE of the tick's own partition through the storage-substrate shim
(index/catalog.py — Iceberg overwritePartitions when the runtime is
present, committed parquet otherwise), which makes a replayed tick
IDEMPOTENT: it replaces its own partition with identical content instead
of appending duplicates. Reads EXCLUDE the in-flight tick's partition
(partition-pruned filter), so a replay adjudicates against exactly the
state the original run saw, at any crash point.

Crash/replay matrix (tick label L, caller writes its corpus partition for
L BEFORE calling tick — see streaming/dedup_stream.py):
  - crash before any write ........ replay recomputes everything
  - crash mid-state-writes ........ replay reads state minus partition L
                                    (untouched), overwrites L identically
  - compaction between crash and
    replay ........................ L's rows (if any were written) folded
                                    into "base"; the replay's existence
                                    gate then classifies them "already
                                    adjudicated" — accepted set is empty,
                                    nothing is double-appended, and the
                                    corpus partition for L already exists
`compact()` rebuilds bands/ and counts/ FROM sig/ (both are projections
of it), so a torn tick can never leave them permanently inconsistent.

Reference parity note: this is the dedup-state edition of the reference's
stateful-index top-up (SimilarDocs' WebUpdaterService add-documents path);
the Lucene index there is likewise the only state the updater consults.
"""
from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.catalog import ParquetIO, get_io
from ..util import local_df
from .dedup import MAX_BUCKET, N_BANDS, N_HASHES, _band_buckets
from .dedup_incremental import (
    edgewise_survivors,
    pairs_against,
    signatures_for,
)

BATCH_COL = "ingest_batch"
BASE_LABEL = "base"


def _sig_schema(n_hashes: int) -> str:
    mh = ", ".join(f"mh{i} string" for i in range(n_hashes))
    return f"doc_id long, {mh}, {BATCH_COL} string"


_BANDS_SCHEMA = f"band int, key string, doc_id long, {BATCH_COL} string"
_COUNTS_SCHEMA = f"band int, key string, cnt long, {BATCH_COL} string"


class BandedDedupState:
    """Open (validating config) or create the state at `root`."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_hashes: int = N_HASHES,
        n_bands: int = N_BANDS,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.io = get_io(spark, self.root)
        self.sig_path = f"{self.root}/sig"
        self.bands_path = f"{self.root}/bands"
        self.counts_path = f"{self.root}/counts"
        self.meta_path = f"{self.root}/meta"
        self._recover_compaction()
        if self.io.exists(spark, self.meta_path):
            row = self.io.read(spark, self.meta_path).collect()[0]
            if (row["n_hashes"], row["n_bands"]) != (n_hashes, n_bands):
                raise ValueError(
                    f"state at {root} was created with n_hashes="
                    f"{row['n_hashes']}, n_bands={row['n_bands']}; opened "
                    f"with ({n_hashes}, {n_bands}) — band keys from "
                    "different configs must never be joined. Re-open with "
                    "the original config or rebuild the state."
                )
        else:
            self.io.overwrite(
                local_df(
                    spark, [(n_hashes, n_bands)], "n_hashes int, n_bands int"
                ),
                self.meta_path,
            )

    # ------------------------------------------------------------- reads

    def _read(self, path: str, schema: str, exclude: str | None) -> DataFrame:
        if not (
            self.io.exists(self.spark, path)
            and self.io.committed(self.spark, path)
        ):
            return local_df(self.spark, [], schema)
        try:
            df = self.io.read(self.spark, path)
        except Exception:
            # committed-but-empty table (zero-row partitioned write leaves a
            # marker and no data files — schema inference has nothing to read)
            return local_df(self.spark, [], schema)
        if exclude is not None:
            # partition-pruned: a replayed tick must see exactly the state
            # the original run saw, minus any partial rows it wrote itself
            df = df.filter(F.col(BATCH_COL) != exclude)
        return df

    def read_signatures(self, exclude: str | None = None) -> DataFrame:
        return self._read(
            self.sig_path, _sig_schema(self.n_hashes), exclude
        ).drop(BATCH_COL)

    def read_bands(self, exclude: str | None = None) -> DataFrame:
        return self._read(self.bands_path, _BANDS_SCHEMA, exclude).drop(
            BATCH_COL
        )

    def read_count_deltas(self, exclude: str | None = None) -> DataFrame:
        """RAW (band, key, cnt) per-tick delta rows — what pairs_against
        consumes (it restricts to touched buckets BEFORE summing, so the
        full-table aggregation below never runs on the tick path)."""
        return self._read(self.counts_path, _COUNTS_SCHEMA, exclude).drop(
            BATCH_COL
        )

    def read_counts(self, exclude: str | None = None) -> DataFrame:
        """Aggregated (band, key, cnt) — per-tick deltas summed (an
        O(live buckets) shuffle; audits/maintenance only, NOT the tick
        path); compaction collapses the deltas to one row per bucket."""
        return (
            self.read_count_deltas(exclude)
            .groupBy("band", "key")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def doc_ids(self, exclude: str | None = None) -> DataFrame:
        return self._read(
            self.sig_path, _sig_schema(self.n_hashes), exclude
        ).select("doc_id")

    # ------------------------------------------------------------ writes

    def _append_partition(self, sig_rows: DataFrame, label: str) -> None:
        """Write one tick's partition to all three tables. `sig_rows` must
        already be MATERIALIZED (localCheckpoint) by the caller — its plan
        must not read the directories this replaces. Idempotent: dynamic
        overwrite replaces partition `label` wholesale on replay."""
        tagged = sig_rows.withColumn(BATCH_COL, F.lit(label))
        self.io.overwrite_dynamic(tagged, self.sig_path, col=BATCH_COL)
        bands = _band_buckets(sig_rows, self.n_hashes, self.n_bands)
        self.io.overwrite_dynamic(
            bands.withColumn(BATCH_COL, F.lit(label)),
            self.bands_path,
            col=BATCH_COL,
        )
        counts = bands.groupBy("band", "key").agg(F.count("*").alias("cnt"))
        self.io.overwrite_dynamic(
            counts.withColumn(BATCH_COL, F.lit(label)),
            self.counts_path,
            col=BATCH_COL,
        )

    def bootstrap(
        self,
        corpus_docs: DataFrame | None = None,
        corpus_sig: DataFrame | None = None,
        text_col: str = "text",
    ) -> None:
        """One-time O(corpus) build of the state from an existing accepted
        corpus (docs, or a pre-computed signature table): signatures are
        written first, then bands/counts are derived from the WRITTEN
        parquet (one materialization — the shingle lineage never runs
        twice). FULL partitioned replaces, not dynamic overwrites: a
        re-bootstrap of a state that already has tick partitions must
        replace them, not coexist with them (same reasoning as
        `_compact_into`)."""
        if (corpus_docs is None) == (corpus_sig is None):
            raise ValueError("pass exactly one of corpus_docs / corpus_sig")
        if corpus_sig is None:
            corpus_sig = signatures_for(corpus_docs, text_col, self.n_hashes)
        keep = ["doc_id", *[f"mh{i}" for i in range(self.n_hashes)]]
        self.io.overwrite_partitioned(
            corpus_sig.select(*keep).withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            self.sig_path,
            col=BATCH_COL,
        )
        written = self.read_signatures()
        bands = _band_buckets(written, self.n_hashes, self.n_bands)
        self.io.overwrite_partitioned(
            bands.withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            self.bands_path,
            col=BATCH_COL,
        )
        self.io.overwrite_partitioned(
            self.read_bands()
            .groupBy("band", "key")
            .agg(F.count("*").alias("cnt"))
            .withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            self.counts_path,
            col=BATCH_COL,
        )

    # -------------------------------------------------------------- tick

    def adjudicate(
        self,
        new_docs: DataFrame,
        label: str,
        text_col: str = "text",
        min_jaccard: float | None = None,
        max_bucket: int = MAX_BUCKET,
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Phase 1 of a tick: adjudicate `new_docs` against the state
        (broadcast-batch strategy — the corpus is STREAMED through two
        broadcast semi-joins, shuffle is O(batch + hits)) WITHOUT writing
        anything. Returns (accepted_docs, pairs, state_rows), all three
        eagerly materialized — their plans must not re-read the state
        directories once phase 2 starts replacing them, and a caller may
        durably commit its own outputs (e.g. the accepted-corpus
        partition) BETWEEN the phases for the crash ordering documented in
        the module docstring.

        Checkpoint staging: the batch signatures are materialized once
        (one shingle pass), then the candidate pairs (one banded join),
        and the accepted/state outputs are cheap derivations of those two
        — three naive independent localCheckpoints would re-execute the
        whole adjudication lineage each (measured ~3× the tick)."""
        new_sig = signatures_for(
            new_docs, text_col, self.n_hashes
        ).localCheckpoint(eager=True)
        pairs = pairs_against(
            new_docs,
            self.read_signatures(exclude=label),
            text_col,
            max_bucket=max_bucket,
            n_hashes=self.n_hashes,
            n_bands=self.n_bands,
            min_jaccard=min_jaccard,
            new_sig=new_sig,
            corpus_bands=self.read_bands(exclude=label),
            corpus_counts=self.read_count_deltas(exclude=label),
        ).localCheckpoint(eager=True)
        survivors = edgewise_survivors(pairs, new_sig.select("doc_id"))
        accepted = new_docs.join(
            survivors, "doc_id", "left_semi"
        ).localCheckpoint(eager=True)
        state_rows = new_sig.join(
            survivors, "doc_id", "left_semi"
        ).localCheckpoint(eager=True)
        return accepted, pairs, state_rows

    def commit_batch(self, state_rows: DataFrame, label: str) -> None:
        """Phase 2 of a tick: write the accepted signatures' state
        partition (sig + bands + counts, all `ingest_batch=label`).
        Idempotent — a replay with the same label replaces its own
        partitions."""
        self._append_partition(state_rows, label)

    def tick(
        self,
        new_docs: DataFrame,
        label: str,
        text_col: str = "text",
        min_jaccard: float | None = None,
        max_bucket: int = MAX_BUCKET,
    ) -> tuple[DataFrame, DataFrame]:
        """One-shot ingest tick (adjudicate + commit) for callers with no
        between-phase output of their own: returns (accepted_docs, pairs),
        both eagerly materialized. `label` must be unique per tick —
        re-running a tick with the same label and input replaces its
        partition idempotently."""
        accepted, pairs, state_rows = self.adjudicate(
            new_docs, label, text_col, min_jaccard, max_bucket
        )
        self.commit_batch(state_rows, label)
        return accepted, pairs

    # -------------------------------------------------------- compaction

    def compact(self) -> None:
        """Fold the per-tick partitions into one "base" partition: sig/ is
        rewritten as-is; bands/ and counts/ are REBUILT from sig/ (they are
        projections of it — this also heals a torn tick that committed sig
        but crashed before bands/counts). Parquet mode stages the three
        rewrites and swaps with roll-forward recovery (a crash never loses
        the state); Iceberg mode rewrites in place (per-table commits are
        atomic). Run from maintenance, not concurrently with ticks."""
        if self.io.mode != "parquet":
            sig = self.read_signatures().localCheckpoint(eager=True)
            self._compact_into(self.io, self.root, sig)
            return
        staged = f"{self.root}/_compact"
        ready = f"{staged}/_READY"
        shutil.rmtree(staged, ignore_errors=True)
        sig = self.read_signatures().localCheckpoint(eager=True)
        self._compact_into(ParquetIO(), staged, sig)
        with open(ready, "w"):
            pass
        self._swap_compacted()

    def _compact_into(self, io, root: str, sig: DataFrame) -> None:
        # overwrite_partitioned (FULL replace, keeping the partition layout),
        # NOT overwrite_dynamic: the compacted output contains only the
        # "base" partition, and a dynamic overwrite replaces only the
        # partitions present in the data — it would leave every old
        # per-tick partition alive alongside the base rows that subsume
        # them (on Iceberg, where compaction rewrites the live table in
        # place, that means every previously-ticked row duplicated; the
        # parquet path stages into a fresh dir, where the two are
        # equivalent, but uses the same call for contract parity)
        io.overwrite_partitioned(
            sig.withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            f"{root}/sig",
            col=BATCH_COL,
        )
        bands = _band_buckets(sig, self.n_hashes, self.n_bands)
        io.overwrite_partitioned(
            bands.withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            f"{root}/bands",
            col=BATCH_COL,
        )
        io.overwrite_partitioned(
            bands.groupBy("band", "key")
            .agg(F.count("*").alias("cnt"))
            .withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            f"{root}/counts",
            col=BATCH_COL,
        )

    def _swap_compacted(self) -> None:
        staged = f"{self.root}/_compact"
        for name in ("sig", "bands", "counts"):
            src = f"{staged}/{name}"
            dst = f"{self.root}/{name}"
            if not os.path.exists(src):
                continue  # roll-forward: this table already swapped
            trash = f"{self.root}/_trash_{name}"
            shutil.rmtree(trash, ignore_errors=True)
            if os.path.exists(dst):
                os.rename(dst, trash)
            os.rename(src, dst)
            shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)

    def _recover_compaction(self) -> None:
        """Roll a compaction interrupted mid-swap forward (staged tables are
        complete once _READY exists) or discard an incomplete staging."""
        staged = f"{self.root}/_compact"
        if not os.path.exists(staged):
            return
        if os.path.exists(f"{staged}/_READY"):
            self._swap_compacted()
        else:
            shutil.rmtree(staged, ignore_errors=True)

    # ------------------------------------------------------------- audit

    def oversized_buckets(
        self, new_docs: DataFrame, text_col: str = "text",
        max_bucket: int = MAX_BUCKET,
    ) -> DataFrame:
        """Combined (state ∪ batch) buckets a tick would skip, with sizes —
        the no-silent-caps audit against the materialized counts (only
        buckets the batch touches can be skipped, so only they are
        reported; corpus-only buckets never reach a pair join)."""
        nb = _band_buckets(
            signatures_for(new_docs, text_col, self.n_hashes),
            self.n_hashes,
            self.n_bands,
        )
        batch_cnt = nb.groupBy("band", "key").agg(
            F.count("*").alias("_bcnt")
        )
        return (
            batch_cnt.join(self.read_counts(), ["band", "key"], "left")
            .select(
                "band",
                "key",
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("_bcnt")).alias(
                    "bucket_size"
                ),
            )
            .filter(F.col("bucket_size") > max_bucket)
        )
