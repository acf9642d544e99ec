"""Robustness of the parquet ingestion path (sources/tables.py):
nanosecond-timestamp normalization with dot-containing column names,
TIMESTAMP_NTZ casting under the UTC-pinned session (fail loudly
otherwise), and the loud guard on nested NTZ fields."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hstream_spark.sources.tables import load_table


def _write(tmp_path, name: str, table: pa.Table) -> str:
    sf_dir = str(tmp_path)
    pq.write_table(table, os.path.join(sf_dir, f"{name}.parquet"))
    return sf_dir


def test_nanos_column_with_dot_name(spark, tmp_path):
    t = pa.table(
        {
            "a.b": pa.array([1704067200_000_000_000], pa.timestamp("ns")),
            "v": pa.array([7], pa.int64()),
        }
    )
    sf_dir = _write(tmp_path, "dotted", t)
    df = load_table(spark, sf_dir, "dotted")
    row = df.collect()[0]
    assert str(row["a.b"]).startswith("2024-01-01")
    assert row["v"] == 7


def test_ntz_column_with_dot_name_casts_epoch_preserving(spark, tmp_path):
    t = pa.table(
        {"x.y": pa.array([1704067200_000_000], pa.timestamp("us"))}
    )
    sf_dir = _write(tmp_path, "ntzdot", t)
    df = load_table(spark, sf_dir, "ntzdot")
    assert df.schema["x.y"].dataType.typeName() == "timestamp"
    assert str(df.collect()[0]["x.y"]).startswith("2024-01-01")


def test_non_utc_session_rejected_for_ntz(spark, tmp_path):
    t = pa.table({"ts": pa.array([1704067200_000_000], pa.timestamp("us"))})
    sf_dir = _write(tmp_path, "tzcheck", t)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            load_table(spark, sf_dir, "tzcheck")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_nested_ntz_fails_loudly(spark, tmp_path):
    inner = pa.array(
        [{"when": 1704067200_000_000}],
        pa.struct([("when", pa.timestamp("us"))]),
    )
    t = pa.table({"payload": inner, "k": pa.array([1], pa.int64())})
    sf_dir = _write(tmp_path, "nested", t)
    with pytest.raises(NotImplementedError, match="nests TIMESTAMP_NTZ"):
        load_table(spark, sf_dir, "nested")
