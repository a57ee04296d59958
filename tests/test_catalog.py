"""Substrate shim: detection, forced modes, and ParquetIO commit semantics."""
from __future__ import annotations

import os

import pytest

from similardocs_spark.index.catalog import (
    IcebergIO,
    ParquetIO,
    get_io,
    iceberg_available,
)


@pytest.mark.spark
def test_sandbox_has_no_iceberg_and_defaults_to_parquet(spark, tmp_path):
    assert iceberg_available(spark) is False
    io = get_io(spark, str(tmp_path))
    assert isinstance(io, ParquetIO) and io.mode == "parquet"


@pytest.mark.spark
def test_forced_modes(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SIMDOCS_SUBSTRATE", "parquet")
    assert isinstance(get_io(spark, str(tmp_path)), ParquetIO)
    monkeypatch.setenv("SIMDOCS_SUBSTRATE", "iceberg")
    with pytest.raises(RuntimeError, match="no Iceberg runtime jar"):
        get_io(spark, str(tmp_path))
    with pytest.raises(RuntimeError):
        IcebergIO(spark, str(tmp_path))


@pytest.mark.spark
def test_parquet_io_dynamic_overwrite_touches_only_present_partitions(
    spark, tmp_path
):
    io = ParquetIO()
    p = str(tmp_path / "t")
    io.overwrite_partitioned(
        spark.createDataFrame([(0, "a"), (1, "b")], "seg long, v string"), p
    )
    # dynamic overwrite of seg=1 only; seg=0 must survive untouched
    io.overwrite_dynamic(spark.createDataFrame([(1, "B")], "seg long, v string"), p)
    got = {(r["seg"], r["v"]) for r in io.read(spark, p).collect()}
    assert got == {(0, "a"), (1, "B")}
    # append + read round-trip
    io.append(spark.createDataFrame([(2, "c")], "seg long, v string"), p + "2")
    io.append(spark.createDataFrame([(3, "d")], "seg long, v string"), p + "2")
    assert io.read(spark, p + "2").count() == 2


class _Chain:
    """Records every method call in a chain: any attribute returns a callable
    that logs (name, args) and returns the same recorder."""

    def __init__(self, log):
        self._log = log

    def __getattr__(self, name):
        def call(*args, **kwargs):
            self._log.append((name, args))
            return self

        return call


class _ChainAppendFails(_Chain):
    """Like _Chain but the writer's .append() raises (table absent)."""

    def __getattr__(self, name):
        if name == "append":
            def fail(*args):
                self._log.append(("append", args))
                raise RuntimeError("table does not exist")

            return fail
        return super().__getattr__(name)


class _FakeSpark:
    def __init__(self, log):
        self._log = log
        self.read = _Chain(log)
        self.catalog = _Chain(log)

    def sql(self, q):
        self._log.append(("sql", (q,)))


def _iceberg_io_unchecked(log):
    """IcebergIO with __init__ bypassed (no jar in sandbox) and a recording
    fake session — contract-tests the call routing of the native branch."""
    io = IcebergIO.__new__(IcebergIO)
    io.spark = _FakeSpark(log)
    return io


def test_iceberg_io_ident_sanitization():
    assert IcebergIO._ident("/root/idx/docs") == "simdocs.index.docs"
    assert IcebergIO._ident("/root/idx/docs.staging/") == "simdocs.index.docs_staging"
    assert IcebergIO._ident("a b/c-d") == "simdocs.index.c_d"


def test_iceberg_io_write_routing():
    log: list = []
    io = _iceberg_io_unchecked(log)
    df = _Chain(log)

    io.overwrite_partitioned(df, "/x/docs")
    assert log == [
        ("writeTo", ("simdocs.index.docs",)),
        ("using", ("iceberg",)),
        ("partitionedBy", ("seg",)),
        ("createOrReplace", ()),
    ]

    log.clear()
    io.overwrite_dynamic(df, "/x/postings")
    assert log == [
        ("writeTo", ("simdocs.index.postings",)),
        ("overwritePartitions", ()),
    ]

    log.clear()
    io.overwrite(df, "/x/stats")
    assert log == [
        ("writeTo", ("simdocs.index.stats",)),
        ("using", ("iceberg",)),
        ("createOrReplace", ()),
    ]

    log.clear()
    io.append(df, "/x/lineage")
    assert log == [("writeTo", ("simdocs.index.lineage",)), ("append", ())]

    # append falls back to create when the table does not exist yet
    log.clear()
    io.append(_ChainAppendFails(log), "/x/lineage")
    assert log == [
        ("writeTo", ("simdocs.index.lineage",)),
        ("append", ()),
        ("writeTo", ("simdocs.index.lineage",)),
        ("using", ("iceberg",)),
        ("create", ()),
    ]


def test_iceberg_io_read_exists_drop_routing():
    log: list = []
    io = _iceberg_io_unchecked(log)
    fake = _FakeSpark(log)

    io.read(fake, "/x/docs")
    assert log == [("table", ("simdocs.index.docs",))]

    log.clear()
    io.exists(fake, "/x/docs.staging")
    assert log == [("tableExists", ("simdocs.index.docs_staging",))]

    log.clear()
    io.committed(fake, "/x/docs.staging")  # atomic commits: committed == exists
    assert log == [("tableExists", ("simdocs.index.docs_staging",))]

    log.clear()
    io.drop(fake, "/x/docs.staging")
    assert log == [("sql", ("DROP TABLE IF EXISTS simdocs.index.docs_staging",))]


@pytest.mark.spark
def test_parquet_io_exists_committed_drop(spark, tmp_path):
    io = ParquetIO()
    p = str(tmp_path / "t")
    assert not io.exists(spark, p)
    io.overwrite(spark.createDataFrame([(1,)], "x long"), p)
    assert io.exists(spark, p) and io.committed(spark, p)
    # marksuccessfuljobs=false deployments: no _SUCCESS, own marker suffices
    os.remove(os.path.join(p, "_SUCCESS"))
    assert io.exists(spark, p) and io.committed(spark, p)
    # a real crash mid-write leaves NEITHER marker → partial
    from similardocs_spark.index.catalog import COMMIT_MARKER

    os.remove(os.path.join(p, COMMIT_MARKER))
    assert io.exists(spark, p) and not io.committed(spark, p)
    io.drop(spark, p)
    assert not io.exists(spark, p)


@pytest.mark.spark
def test_get_io_for_index_honors_recorded_substrate(spark, tmp_path, monkeypatch):
    from similardocs_spark.index.build import IndexPaths, _log_lineage
    from similardocs_spark.index.catalog import get_io_for_index

    paths = IndexPaths(str(tmp_path / "idx"))
    os.makedirs(paths.root, exist_ok=True)
    _log_lineage(spark, paths, [("substrate", -1, 0, 0, "parquet")])
    # recorded substrate wins even when the environment says otherwise
    monkeypatch.setenv("SIMDOCS_SUBSTRATE", "iceberg")
    assert isinstance(get_io_for_index(spark, paths), ParquetIO)
    # recorded iceberg without the jar → fail fast, not silent parquet
    paths2 = IndexPaths(str(tmp_path / "idx2"))
    os.makedirs(paths2.root, exist_ok=True)
    monkeypatch.delenv("SIMDOCS_SUBSTRATE")
    _log_lineage(spark, paths2, [("substrate", -1, 0, 0, "iceberg")])
    with pytest.raises(RuntimeError, match="no Iceberg runtime jar"):
        get_io_for_index(spark, paths2)
    # conflicting records → fail fast
    _log_lineage(spark, paths2, [("substrate", -1, 0, 0, "parquet")])
    with pytest.raises(RuntimeError, match="conflicting substrates"):
        get_io_for_index(spark, paths2)
    # no record (pre-shim index) → environment selection
    paths3 = IndexPaths(str(tmp_path / "idx3"))
    assert isinstance(get_io_for_index(spark, paths3), ParquetIO)
