"""Profile store + materialization — the service/TopIndex equivalent.

Reference model (TopIndex.scala:45-135, 319-478, 624-723): per-(user, profile)
documents holding the profile sentence and a denormalized list of similar-doc
ids; a background updater refreshes stale profiles (update_time == 0 or older
than 2h) by running the similarity search with maxDocs=Conf.maxDocs and
splitTime=true; retrieval interleaves per-profile id lists round-robin
(limitDocs) and applies an optional recency gate on update_date.

Spark-native shape: a parquet table (Iceberg MERGE INTO on deployments with
the runtime jar) + ONE batch job for the updater instead of a polling
one-at-a-time Future loop. `update_time == 0` is the stale marker, exactly
as the reference (TopIndex.scala:651,697-698).

Scale shape: every mutation is a DATAFLOW — filter / join against a
LocalRelation of changed rows, staged write, atomic-ish swap — never a
full-table collect to the driver. Driver residency is bounded by one
updater CHUNK (ids + contents of `chunk_size` stale profiles at a time via
toLocalIterator) plus the per-chunk result id lists, which stream to a
spill parquet before the final merge join. The reference's table is tiny
(per-user profiles), but at millions of profiles the old read-modify-write
was a driver bottleneck (round-3 review)."""
from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .oracle.refsearch import DEFAULT_MAX_DOCS, DEFAULT_MIN_NGRAMS, days_ago_str

SCHEMA = (
    "id string, user string, prof_name string, prof_content string, "
    "creation_time long, update_time long, sd_ids array<long>, sd_scores array<float>"
)
RESULT_SCHEMA = (
    "id string, _new_ids array<long>, _new_scores array<float>, _new_time long"
)
STALE_DELTA_MS = 2 * 60 * 60 * 1000  # TopIndex.scala:54 deltaTime
UPDATE_CHUNK = 10_000  # stale profiles materialized on the driver at a time


def profile_id(user: str, name: str) -> str:
    """Reference id = "<user>_<name>" lowercased via LowerCaseAnalyzer
    (TopIndex.scala:382, LowerCaseAnalyzer.scala:19-30)."""
    from .textnorm import uniform_string

    return uniform_string(f"{user.strip()}_{name.strip()}")


@dataclass
class ProfileStore:
    """Substrate-routed: on deployments with the Iceberg runtime the store
    is a catalog table and every overwrite is a native snapshot commit
    (createOrReplace — atomic, no staging dance); the parquet fallback
    implements the same semantics with a staged directory swap plus crash
    recovery. Selection mirrors index/catalog.get_io (SIMDOCS_SUBSTRATE
    override honored)."""

    spark: SparkSession
    path: str

    def __post_init__(self) -> None:
        from .index.catalog import get_io

        self._io = get_io(self.spark, self.path)

    def _read(self) -> DataFrame:
        from .index.build import small_df

        if self._io.mode == "parquet":
            self._recover()
        if not self._io.exists(self.spark, self.path):
            return small_df(self.spark, [], SCHEMA)
        return self._io.read(self.spark, self.path)

    # ------------------------------------------------------ staged overwrite

    def _stage(self) -> str:
        return self.path + ".staging"

    def _old(self) -> str:
        return self.path + ".old"

    def _recover(self) -> None:
        """(parquet mode only) Finish or roll back a swap interrupted by a
        crash: a COMMITTED staging next to a missing live table is rolled
        forward; anything else partial is discarded (the live table —
        possibly parked at .old — is restored)."""
        stage, old = self._stage(), self._old()
        if not os.path.exists(self.path):
            if os.path.exists(stage) and self._io.committed(self.spark, stage):
                os.rename(stage, self.path)  # roll forward
            elif os.path.exists(old):
                os.rename(old, self.path)  # roll back
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def _write_staged(self, df: DataFrame) -> None:
        """Overwrite the store FROM A PLAN THAT READS IT.

        Iceberg substrate: one native createOrReplace — the new snapshot's
        data files are written while reads still resolve the previous
        snapshot, and the metadata swap is atomic (this IS the two-phase
        commit, done by the table format).

        Parquet substrate: write to a staging dir first (the source parquet
        stays live while the job runs), then swap directories — the same
        crash-repairable two-phase shape as index/incremental, with
        `_recover` rolling an interrupted swap forward or back."""
        if self._io.mode != "parquet":
            self._io.overwrite(df, self.path)
            return
        stage, old = self._stage(), self._old()
        shutil.rmtree(stage, ignore_errors=True)
        self._io.overwrite(df, stage)  # writes the commit marker
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(stage, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def _merge_rows(self, changed: list[dict]) -> None:
        """Upsert a bounded set of fully-specified rows: anti-join the live
        table against the changed ids, union the new rows, staged write.
        One shuffle-free broadcast anti-join regardless of table size."""
        from .util import _schema_columns, local_df

        cols = _schema_columns(SCHEMA)
        changed_df = local_df(
            self.spark, [tuple(d[c] for c in cols) for d in changed], SCHEMA
        )
        survivors = self._read().join(
            F.broadcast(changed_df.select("id")), "id", "left_anti"
        )
        self._write_staged(survivors.unionByName(changed_df))

    # ------------------------------------------------------------------ CRUD

    def add_profile(self, user: str, name: str, content: str, now_ms: int) -> None:
        """Upsert; an unchanged content is a no-op, a changed one resets
        update_time to 0 (stale) — TopIndex.scala:105-135. Reads ONLY the
        targeted row; the rewrite is an anti-join merge, not a collect."""
        pid = profile_id(user, name)
        old = self._read().filter(F.col("id") == pid).collect()
        old_row = old[0].asDict() if old else None
        if old_row is not None and old_row["prof_content"] == content:
            return
        creation = old_row["creation_time"] if old_row else now_ms
        self._merge_rows([
            dict(
                id=pid, user=user, prof_name=name, prof_content=content,
                creation_time=creation, update_time=0, sd_ids=[], sd_scores=[],
            )
        ])

    def delete_profile(self, user: str, name: str) -> None:
        pid = profile_id(user, name)
        self._write_staged(self._read().filter(F.col("id") != pid))

    def delete_user(self, user: str) -> None:
        self._write_staged(self._read().filter(F.col("user") != user))

    def get_profiles(self, user: str) -> list:
        return (
            self._read().filter(F.col("user") == user).orderBy("prof_name").collect()
        )

    def users(self) -> list[str]:
        return [r["user"] for r in self._read().select("user").distinct().collect()]

    # -------------------------------------------------------------- updating

    def _search_chunk(self, engine, chunk: list[tuple[str, str]], now_ms: int) -> list:
        """Refresh one chunk of (id, content) → RESULT_SCHEMA tuples."""
        kwargs = dict(
            max_docs=DEFAULT_MAX_DOCS, min_ngrams=DEFAULT_MIN_NGRAMS,
            split_time=True,
        )
        if hasattr(engine, "search_batch"):
            res = engine.search_batch(dict(chunk), **kwargs)
        else:  # engines without batch support (e.g. test fakes)
            res = {pid: engine.search(content, **kwargs) for pid, content in chunk}
        return [
            (
                pid,
                [int(h.doc_id) for h in res.get(pid, [])],
                [float(h.score) for h in res.get(pid, [])],
                now_ms,
            )
            for pid, _ in chunk
        ]

    def update_stale(
        self, engine, now_ms: int, delta_ms: int = STALE_DELTA_MS,
        chunk_size: int = UPDATE_CHUNK,
    ) -> int:
        """Batch refresh of every stale profile (update_time == 0 or older than
        delta) — the Spark-native form of the reference's one-at-a-time
        background Future loop (TopIndex.scala:624-666). Dataflow shape:

          stale = filter(update_time stale)           # never collected whole
          for each chunk of `chunk_size` (id, content) via toLocalIterator:
              search_batch(chunk) → result rows appended to a spill parquet
          merged = profiles LEFT JOIN spill ON id     # one join
          staged write + swap

        Driver residency is one chunk of contents + one chunk of top-k id
        lists at a time; everything else stays distributed. Returns
        #refreshed."""
        df = self._read()
        stale_cond = (F.col("update_time") == 0) | (
            F.col("update_time") < now_ms - delta_ms
        )
        stale = df.filter(stale_cond).select("id", "prof_content")
        from .util import local_df

        spill = self.path + ".updates"
        shutil.rmtree(spill, ignore_errors=True)
        n_refreshed = 0
        chunk: list[tuple[str, str]] = []

        def flush() -> None:
            nonlocal n_refreshed
            if not chunk:
                return
            rows = self._search_chunk(engine, chunk, now_ms)
            local_df(self.spark, rows, RESULT_SCHEMA).write.mode("append").parquet(
                spill
            )
            n_refreshed += len(chunk)
            chunk.clear()

        for r in stale.toLocalIterator():
            chunk.append((r["id"], r["prof_content"]))
            if len(chunk) >= chunk_size:
                flush()
        flush()
        if n_refreshed == 0:
            return 0
        res_df = self.spark.read.parquet(spill)
        merged = (
            df.join(res_df, "id", "left")
            .select(
                "id", "user", "prof_name", "prof_content", "creation_time",
                F.coalesce("_new_time", F.col("update_time")).alias("update_time"),
                F.coalesce("_new_ids", F.col("sd_ids")).alias("sd_ids"),
                F.coalesce("_new_scores", F.col("sd_scores")).alias("sd_scores"),
            )
        )
        self._write_staged(merged)
        shutil.rmtree(spill, ignore_errors=True)
        return n_refreshed

    def reset_all_times(self, user: str | None = None) -> int:
        """Mark profiles stale (update_time = 0) — the reference's
        resetAllTimes/reset paths (TopIndex.scala:730-821); optionally scoped
        to one user. The next update_stale() rematerializes them. Pure
        dataflow: count + conditional column rewrite, no collect."""
        df = self._read()
        cond = F.col("update_time") != 0
        if user is not None:
            cond = cond & (F.col("user") == user)
        n = df.filter(cond).count()
        if n:
            self._write_staged(
                df.withColumn(
                    "update_time",
                    F.when(cond, F.lit(0).cast("long")).otherwise(
                        F.col("update_time")
                    ),
                )
            )
        return int(n)

    def update_all(self, engine, now_ms: int) -> int:
        """Force-refresh every profile regardless of staleness
        (updateAllSimilarDocs — TopIndex.scala:844-851 preprocess path)."""
        self.reset_all_times()
        return self.update_stale(engine, now_ms)

    # ------------------------------------------------------------- retrieval

    def get_sim_docs(
        self,
        engine,
        user: str,
        names: list[str],
        max_docs: int = DEFAULT_MAX_DOCS,
        consider_date_days: int | None = None,
        now_ms: int | None = None,
    ) -> list[dict]:
        """Round-robin interleave of the per-profile materialized id lists
        (limitDocs — TopIndex.scala:455-478), then doc-field lookup with an
        optional update_date recency gate (TopIndex.scala:410-443). Profiles
        with update_time == 0 are refreshed on demand (TopIndex.scala:386-388).
        Reads ONLY the requested profile rows; on-demand refreshes merge back
        via the bounded upsert, never a full-table rewrite."""
        pids = [profile_id(user, name) for name in names]
        table = {
            r["id"]: r.asDict()
            for r in self._read().filter(F.col("id").isin(pids)).collect()
        }
        id_lists: list[list[int]] = []
        dirty_rows: list[dict] = []
        for pid in pids:
            row = table.get(pid)
            if row is None:
                continue
            if row["update_time"] == 0:
                hits = engine.search(
                    row["prof_content"], max_docs=DEFAULT_MAX_DOCS,
                    min_ngrams=DEFAULT_MIN_NGRAMS, split_time=True,
                )
                row["sd_ids"] = [int(h.doc_id) for h in hits]
                row["sd_scores"] = [float(h.score) for h in hits]
                row["update_time"] = now_ms or 1
                dirty_rows.append(row)
            if row["sd_ids"]:
                id_lists.append(list(row["sd_ids"]))
        if dirty_rows:
            self._merge_rows(dirty_rows)

        ids = limit_docs(id_lists, max_docs)
        if not ids:
            return []
        docs = (
            engine._docs.filter(F.col("doc_id").isin(ids))
            .select("doc_id", "conv_id", "update_date", "db", "instance")
            .collect()
        )
        by_id = {r["doc_id"]: r.asDict() for r in docs}
        out = [by_id[i] for i in ids if i in by_id]
        if consider_date_days is not None:
            gate = days_ago_str(engine.today, consider_date_days)
            out = [d for d in out if d["update_date"] >= gate]
        return out


def import_json_profiles(store: "ProfileStore", path: str, now_ms: int) -> int:
    """JSON profile import (reference others/UpdateProfiles.scala:69-123:
    {id: {field: [values]}} → upsert). Spark-native: spark.read.json +
    per-row upsert through the same MERGE semantics."""
    import json

    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    n = 0
    for pid, fields in sorted(data.items()):
        user = fields.get("user", [pid])[0]
        name = fields.get("prof_name", [pid])[0]
        content = " ".join(fields.get("prof_content", []))
        if content:
            store.add_profile(user, name, content, now_ms)
            n += 1
    return n


def limit_docs(doc_lists: list[list[int]], max_docs: int) -> list[int]:
    """Reference limitDocs (TopIndex.scala:455-478): repeatedly take the head
    of each non-empty list in order, appending up to the remaining quota."""
    ids: list[int] = []
    docs = [list(l) for l in doc_lists]
    while docs:
        num = max_docs - len(ids)
        if num <= 0:
            break
        heads = [l[0] for l in docs if l]
        docs = [l[1:] for l in docs if len(l) > 1]
        ids.extend(heads[:num])
    return ids[:max_docs]
