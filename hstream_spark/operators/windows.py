"""Time-window operators: TUMBLE / HOP / SESSION.

Reference semantics: windows attach to FROM and hoist onto GROUP BY
(hstream-sql/src/HStream/SQL/AST.hs:682-689); assignment arithmetic at
hstream-processing/src/HStream/Processing/Stream/TimeWindows.hs:34-48
(tumbling/hopping) and SessionWindowedStream.hs:93-138 (gap merge).

Spark mapping is the native `F.window` / `F.session_window` — these are
Catalyst expressions that expand windows *before* the shuffle, so the
aggregation is an ordinary hash-agg on (window, keys) with map-side
combine. Hopping multiplies rows by ceil(size/advance) at the map side
only; session windows use Spark's built-in session state merge.

Works identically on batch DataFrames (testing, backfill) and streaming
DataFrames (continuous queries, add `.withWatermark` upstream —
reference grace is a fixed 24h, TimeWindows.hs:39,47; ours defaults to
that but is configurable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_GRACE = "24 hours"  # TimeWindows.hs:39,47 — fixed 24h in the reference


def tumble(
    df: DataFrame,
    ts: str | Column,
    size: str,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """TUMBLE(stream, INTERVAL size) + GROUP BY keys."""
    group = [F.window(ts, size).alias("window"), *keys]
    return df.groupBy(*group).agg(*aggs)


def hop(
    df: DataFrame,
    ts: str | Column,
    size: str,
    advance: str,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """HOP(stream, INTERVAL size, INTERVAL advance) — record lands in
    ceil(size/advance) windows (TimeWindowedStream.hs:116-128)."""
    group = [F.window(ts, size, advance).alias("window"), *keys]
    return df.groupBy(*group).agg(*aggs)


def session(
    df: DataFrame,
    ts: str | Column,
    gap: str,
    keys: Sequence[str | Column] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """SESSION(stream, INTERVAL gap) — gap-merged sessions per key
    (SessionWindowedStream.hs:93-138)."""
    group = [F.session_window(ts, gap).alias("window"), *keys]
    return df.groupBy(*group).agg(*aggs)


def with_window_bounds(df: DataFrame, unit: str = "second") -> DataFrame:
    """Expose window start/end like the reference serializes them into the
    sink key (Codegen/V1.hs:420-456): as epoch numbers, stable across TZ."""
    factor = {"second": 1, "millisecond": 1000}[unit]
    return df.select(
        (F.unix_timestamp(F.col("window.start")) * factor).alias("window_start"),
        (F.unix_timestamp(F.col("window.end")) * factor).alias("window_end"),
        *[c for c in df.columns if c != "window"],
    )
