"""Persistent LSH bucket/vector state for incremental embedding dedup —
the vector edition of `operators/dedup_state.BandedDedupState`, backing
`streaming/ann_stream.py` the way BandedDedupState backs
`streaming/dedup_stream.py`.

Layout (all under one root, through the storage-substrate shim):

  <root>/meta/   one row (dim, bits, tables, seed) — config pinned at
                 creation; opening with a different config fails fast
                 (bucket ids from different hash families must never be
                 joined). THE SOURCE OF TRUTH for the LSH config: state
                 rows also stamp it in field metadata (ann_incremental's
                 convention), but partitioned-append round-trips may drop
                 field metadata, so reads re-stamp from meta.
  <root>/state/  (vec_id, embedding float[], _n, b0..b{tables-1})
                 partitioned by `ingest_batch` — one partition per
                 accepted tick plus "base" after bootstrap/compaction.

Same write discipline as the text edition (and the same crash/replay
matrix — see dedup_state.py): every tick is a DYNAMIC partition
overwrite of its own `ingest_batch=label` partition (idempotent
replays); bootstrap and compaction are FULL partitioned replaces
(overwrite_partitioned — a dynamic overwrite would leave old tick
partitions alive next to the base rows that subsume them).

`compact(reband_bits=...)` optionally re-sizes the bucket space during
the fold (`ann_incremental.reband_state`, one projection pass over the
stored vectors — the measured maintenance recipe: ANN_TICK_SCALING.json
shows a +1-bit reband of a 3M-vector state at 6.4 s / zero shuffle with
the follow-up tick's shuffle dropping 3×).
"""
from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.catalog import ParquetIO, get_io
from ..util import local_df
from . import ann_incremental as inc
from .ann import lsh_bits_for

BATCH_COL = "ingest_batch"
BASE_LABEL = "base"


def _state_schema(tables: int) -> str:
    b = ", ".join(f"b{t} long" for t in range(tables))
    return (
        f"vec_id long, embedding array<float>, _n double, {b}, "
        f"{BATCH_COL} string"
    )


class VectorDedupState:
    """Open (validating config) or create the vector state at `root`.

    dim/bits/tables/seed: required at CREATION (bits defaults from
    `lsh_bits_for(expected_corpus)` if `expected_corpus` is given);
    on open, omitted values load from meta and provided ones must match.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        dim: int | None = None,
        bits: int | None = None,
        tables: int | None = None,
        seed: int | None = None,
        expected_corpus: int | None = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.io = get_io(spark, self.root)
        self.state_path = f"{self.root}/state"
        self.meta_path = f"{self.root}/meta"
        self._recover_compaction()
        if self.io.exists(spark, self.meta_path):
            row = self.io.read(spark, self.meta_path).collect()[0]
            stored = {
                "dim": row["dim"], "bits": row["bits"],
                "tables": row["tables"], "seed": row["seed"],
            }
            # only EXPLICITLY provided values are validated; omitted ones
            # (None — the default for every config argument) load from meta,
            # matching the documented open contract (a state created with
            # non-default tables/seed reopens cleanly via
            # VectorDedupState(spark, root))
            asked = {"dim": dim, "bits": bits, "tables": tables, "seed": seed}
            for k, v in asked.items():
                if v is not None and v != stored[k]:
                    raise ValueError(
                        f"state at {root} was created with {k}={stored[k]}, "
                        f"opened with {v} — bucket ids from different LSH "
                        "configs must never be joined. Re-open with the "
                        "original config (or omit it) or rebuild."
                    )
            self.dim, self.bits = stored["dim"], stored["bits"]
            self.tables, self.seed = stored["tables"], stored["seed"]
        else:
            if dim is None:
                raise ValueError("dim is required when creating a new state")
            if bits is None:
                bits = lsh_bits_for(expected_corpus or 1_000_000)
            self.dim, self.bits, self.tables, self.seed = (
                dim, bits, tables if tables is not None else 2,
                seed if seed is not None else 42,
            )
            self.io.overwrite(
                local_df(
                    spark,
                    [(self.dim, self.bits, self.tables, self.seed)],
                    "dim int, bits int, tables int, seed int",
                ),
                self.meta_path,
            )

    # ------------------------------------------------------------- reads

    def read_state(self, exclude: str | None = None) -> DataFrame:
        if not (
            self.io.exists(self.spark, self.state_path)
            and self.io.committed(self.spark, self.state_path)
        ):
            df = local_df(self.spark, [], _state_schema(self.tables))
        else:
            try:
                df = self.io.read(self.spark, self.state_path)
            except Exception:  # committed-but-empty partitioned table
                df = local_df(self.spark, [], _state_schema(self.tables))
        if exclude is not None:
            df = df.filter(F.col(BATCH_COL) != exclude)
        # re-stamp the LSH config as field metadata (meta/ is the truth;
        # partitioned round-trips may drop it) so ann_incremental's
        # fail-fast validation and config resolution keep working
        meta = {
            "dim": self.dim, "bits": self.bits,
            "tables": self.tables, "seed": self.seed,
        }
        cols = [
            F.col(c).alias(c, metadata=meta) if c.startswith("b") else F.col(c)
            for c in df.columns
            if c != BATCH_COL
        ]
        return df.select(*cols)

    def vec_ids(self, exclude: str | None = None) -> DataFrame:
        return self.read_state(exclude).select("vec_id")

    # alias so stream drivers can treat text/vector states uniformly
    def doc_ids(self, exclude: str | None = None) -> DataFrame:
        return self.vec_ids(exclude).withColumnRenamed("vec_id", "doc_id")

    # ------------------------------------------------------------ writes

    def bootstrap(self, corpus_embeddings: DataFrame) -> None:
        """One-time O(corpus) build from an existing accepted corpus —
        FULL partitioned replace (a re-bootstrap must replace stale tick
        partitions, not coexist with them)."""
        rows = inc.state_for(
            corpus_embeddings, self.dim, self.bits, self.tables, self.seed
        )
        self.io.overwrite_partitioned(
            rows.withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            self.state_path,
            col=BATCH_COL,
        )

    # -------------------------------------------------------------- tick

    def adjudicate(
        self,
        new_embeddings: DataFrame,
        label: str,
        threshold: float = 0.9,
        max_bucket: int = 2000,
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Phase 1 of a tick (no writes): (accepted, pairs, state_rows),
        eagerly materialized — phase 2 replaces the directories their
        plans would otherwise re-read. Reads exclude the in-flight
        label's own partition (replay sees the original's state)."""
        corpus = self.read_state(exclude=label)
        accepted, pairs, state_rows = inc.accept_batch(
            new_embeddings,
            corpus,
            threshold=threshold,
            bits=self.bits,
            tables=self.tables,
            seed=self.seed,
            max_bucket=max_bucket,
            dim=self.dim,
        )
        pairs = pairs.localCheckpoint(eager=True)
        accepted = accepted.localCheckpoint(eager=True)
        state_rows = state_rows.localCheckpoint(eager=True)
        return accepted, pairs, state_rows

    def commit_batch(self, state_rows: DataFrame, label: str) -> None:
        """Phase 2: dynamic overwrite of the tick's own partition
        (idempotent on replay)."""
        self.io.overwrite_dynamic(
            state_rows.withColumn(BATCH_COL, F.lit(label)),
            self.state_path,
            col=BATCH_COL,
        )

    def tick(
        self,
        new_embeddings: DataFrame,
        label: str,
        threshold: float = 0.9,
        max_bucket: int = 2000,
    ) -> tuple[DataFrame, DataFrame]:
        accepted, pairs, state_rows = self.adjudicate(
            new_embeddings, label, threshold, max_bucket
        )
        self.commit_batch(state_rows, label)
        return accepted, pairs

    # -------------------------------------------------------- compaction

    def compact(self, reband_bits: int | None = None) -> None:
        """Fold per-tick partitions into "base"; with `reband_bits`,
        re-derive the bucket columns at the new size in the same pass
        (`reband_state` — one projection over the stored vectors) and
        update meta so subsequent ticks pick the new config up. Staged
        swap with roll-forward on parquet; atomic per-table replaces on
        Iceberg. Run from maintenance, not concurrently with ticks."""
        rows = self.read_state().localCheckpoint(eager=True)
        new_bits = self.bits
        if reband_bits is not None and reband_bits != self.bits:
            rows = inc.reband_state(
                rows, bits=reband_bits
            ).localCheckpoint(eager=True)
            new_bits = reband_bits
        if self.io.mode != "parquet":
            self._compact_into(self.io, self.root, rows)
            self._write_meta(self.io, self.root, new_bits)
            self.bits = new_bits
            return
        staged = f"{self.root}/_compact"
        shutil.rmtree(staged, ignore_errors=True)
        pio = ParquetIO()
        self._compact_into(pio, staged, rows)
        self._write_meta(pio, staged, new_bits)
        with open(f"{staged}/_READY", "w"):
            pass
        self._swap_compacted()
        self.bits = new_bits

    def _write_meta(self, io, root: str, bits: int) -> None:
        io.overwrite(
            local_df(
                self.spark,
                [(self.dim, bits, self.tables, self.seed)],
                "dim int, bits int, tables int, seed int",
            ),
            f"{root}/meta",
        )

    def _compact_into(self, io, root: str, rows: DataFrame) -> None:
        io.overwrite_partitioned(
            rows.withColumn(BATCH_COL, F.lit(BASE_LABEL)),
            f"{root}/state",
            col=BATCH_COL,
        )

    def _swap_compacted(self) -> None:
        staged = f"{self.root}/_compact"
        for name in ("state", "meta"):
            src = f"{staged}/{name}"
            dst = f"{self.root}/{name}"
            if not os.path.exists(src):
                continue  # roll-forward: already swapped
            trash = f"{self.root}/_trash_{name}"
            shutil.rmtree(trash, ignore_errors=True)
            if os.path.exists(dst):
                os.rename(dst, trash)
            os.rename(src, dst)
            shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)

    def _recover_compaction(self) -> None:
        staged = f"{self.root}/_compact"
        if not os.path.exists(staged):
            return
        if os.path.exists(f"{staged}/_READY"):
            self._swap_compacted()
        else:
            shutil.rmtree(staged, ignore_errors=True)
