"""Profile store + materialization — the service/TopIndex equivalent.

Reference model (TopIndex.scala:45-135, 319-478, 624-723): per-(user, profile)
documents holding the profile sentence and a denormalized list of similar-doc
ids; a background updater refreshes stale profiles (update_time == 0 or older
than 2h) by running the similarity search with maxDocs=Conf.maxDocs and
splitTime=true; retrieval interleaves per-profile id lists round-robin
(limitDocs) and applies an optional recency gate on update_date.

Spark-native shape: a small parquet table (Iceberg MERGE INTO at scale; this
sandbox lacks the runtime jar, so upserts are read-modify-write of a tiny
table) + ONE batch job for the updater instead of a polling one-at-a-time
Future loop. `update_time == 0` is the stale marker, exactly as the reference
(TopIndex.scala:651,697-698).
"""
from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .oracle.refsearch import DEFAULT_MAX_DOCS, DEFAULT_MIN_NGRAMS, days_ago_str

SCHEMA = (
    "id string, user string, prof_name string, prof_content string, "
    "creation_time long, update_time long, sd_ids array<long>, sd_scores array<float>"
)
STALE_DELTA_MS = 2 * 60 * 60 * 1000  # TopIndex.scala:54 deltaTime


def profile_id(user: str, name: str) -> str:
    """Reference id = "<user>_<name>" lowercased via LowerCaseAnalyzer
    (TopIndex.scala:382, LowerCaseAnalyzer.scala:19-30)."""
    from .textnorm import uniform_string

    return uniform_string(f"{user.strip()}_{name.strip()}")


@dataclass
class ProfileStore:
    spark: SparkSession
    path: str

    def _read(self) -> DataFrame:
        from .index.build import small_df

        if not os.path.exists(self.path):
            return small_df(self.spark, [], SCHEMA)
        return self.spark.read.parquet(self.path)

    def _write(self, df: DataFrame) -> None:
        from .index.build import small_df

        rows = [tuple(r) for r in df.collect()]  # tiny table; single-slice write
        small_df(self.spark, rows, SCHEMA).write.mode("overwrite").parquet(self.path)

    # ------------------------------------------------------------------ CRUD

    def add_profile(self, user: str, name: str, content: str, now_ms: int) -> None:
        """Upsert; an unchanged content is a no-op, a changed one resets
        update_time to 0 (stale) — TopIndex.scala:105-135."""
        pid = profile_id(user, name)
        rows = {r["id"]: r.asDict() for r in self._read().collect()}
        old = rows.get(pid)
        if old is not None and old["prof_content"] == content:
            return
        creation = old["creation_time"] if old else now_ms
        rows[pid] = dict(
            id=pid, user=user, prof_name=name, prof_content=content,
            creation_time=creation, update_time=0, sd_ids=[], sd_scores=[],
        )
        self._write(self.spark.createDataFrame(list(rows.values()), SCHEMA))

    def delete_profile(self, user: str, name: str) -> None:
        pid = profile_id(user, name)
        self._write(self._read().filter(F.col("id") != pid))

    def delete_user(self, user: str) -> None:
        self._write(self._read().filter(F.col("user") != user))

    def get_profiles(self, user: str) -> list:
        return (
            self._read().filter(F.col("user") == user).orderBy("prof_name").collect()
        )

    def users(self) -> list[str]:
        return [r["user"] for r in self._read().select("user").distinct().collect()]

    # -------------------------------------------------------------- updating

    def update_stale(self, engine, now_ms: int, delta_ms: int = STALE_DELTA_MS) -> int:
        """Batch refresh of every stale profile (update_time == 0 or older than
        delta) — the Spark-native form of the reference's one-at-a-time
        background Future loop (TopIndex.scala:624-666). All stale profiles go
        through ONE batched search plan (search_batch) when the engine supports
        it. Returns #refreshed."""
        rows = [r.asDict() for r in self._read().collect()]
        stale = [
            row for row in rows
            if row["update_time"] == 0 or row["update_time"] < now_ms - delta_ms
        ]
        if not stale:
            return 0
        if hasattr(engine, "search_batch"):
            res = engine.search_batch(
                {row["id"]: row["prof_content"] for row in stale},
                max_docs=DEFAULT_MAX_DOCS,
                min_ngrams=DEFAULT_MIN_NGRAMS,
                split_time=True,
            )
            for row in stale:
                hits = res.get(row["id"], [])
                row["sd_ids"] = [int(h.doc_id) for h in hits]
                row["sd_scores"] = [float(h.score) for h in hits]
                row["update_time"] = now_ms
        else:  # engines without batch support (e.g. test fakes)
            for row in stale:
                hits = engine.search(
                    row["prof_content"],
                    max_docs=DEFAULT_MAX_DOCS,
                    min_ngrams=DEFAULT_MIN_NGRAMS,
                    split_time=True,
                )
                row["sd_ids"] = [int(h.doc_id) for h in hits]
                row["sd_scores"] = [float(h.score) for h in hits]
                row["update_time"] = now_ms
        self._write(self.spark.createDataFrame(rows, SCHEMA))
        return len(stale)

    def reset_all_times(self, user: str | None = None) -> int:
        """Mark profiles stale (update_time = 0) — the reference's
        resetAllTimes/reset paths (TopIndex.scala:730-821); optionally scoped
        to one user. The next update_stale() rematerializes them."""
        rows = [r.asDict() for r in self._read().collect()]
        n = 0
        for row in rows:
            if user is None or row["user"] == user:
                if row["update_time"] != 0:
                    row["update_time"] = 0
                    n += 1
        if n:
            self._write(self.spark.createDataFrame(rows, SCHEMA))
        return n

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
        with update_time == 0 are refreshed on demand (TopIndex.scala:386-388)."""
        table = {r["id"]: r.asDict() for r in self._read().collect()}
        id_lists: list[list[int]] = []
        dirty = False
        for name in names:
            row = table.get(profile_id(user, name))
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
                dirty = True
            if row["sd_ids"]:
                id_lists.append(list(row["sd_ids"]))
        if dirty:
            self._write(self.spark.createDataFrame(list(table.values()), SCHEMA))

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
