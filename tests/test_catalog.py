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
