"""Core relational operators: scan → filter → affiliate → reduce →
having → project — the fixed plan order of the reference
(hstream-sql/src/HStream/SQL/Planner.hs:338-387).

Each builder is a thin declarative wrapper over DataFrame ops; the
value is the *contract* (names, order, semantics), while Catalyst is
free to reorder/push down — e.g. a WHERE filter lands in the parquet
scan's PushedFilters, which the reference (zero-optimizer,
row-at-a-time) cannot do.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scan(spark, path: str) -> DataFrame:
    """Stream scan (Planner.hs:23) — batch flavor: columnar parquet scan
    with pushdown; streaming flavor lives in sources/registry.py."""
    return spark.read.parquet(path)


def stream_rename(df: DataFrame, name: str) -> DataFrame:
    """Stream alias — retags the qualifier (Planner.hs:24); Spark alias
    keeps it a metadata-only operation."""
    return df.alias(name)


def where(df: DataFrame, predicate: Column) -> DataFrame:
    """Filter (Planner.hs:38). Reference drops rows whose predicate
    *errors* (Codegen/V1.hs:235-240); Spark expressions yield NULL on
    most error-ish cases which `filter` likewise drops."""
    return df.filter(predicate)


def affiliate(df: DataFrame, items: Mapping[str, Column]) -> DataFrame:
    """Affiliate (Planner.hs:40, rSelToAffiliateItems) — add every
    computed SELECT item as a column before aggregation."""
    return df.withColumns(dict(items))


def project(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """Project (Planner.hs:39); empty list = ``*`` wildcard
    (Planner.hs:384-386)."""
    return df.select(*cols) if cols else df


def reduce(
    df: DataFrame,
    keys: Sequence[Column | str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Reduce (Planner.hs:45) — hash aggregation; GROUP BY is columns
    only in the dialect (AST.hs:653-656) but we accept expressions."""
    return df.groupBy(*keys).agg(*aggs)


def having(df: DataFrame, predicate: Column) -> DataFrame:
    """HAVING = post-aggregation filter (Planner.hs:343-345)."""
    return df.filter(predicate)


def distinct(df: DataFrame) -> DataFrame:
    """Distinct plan node (Planner.hs:48; V1 throws, V2 differential —
    DiffFlow/Graph.hs:71). Spark: native."""
    return df.distinct()


def union(left: DataFrame, right: DataFrame) -> DataFrame:
    """Union (Planner.hs:54; V1 throws, V2 implements). By-name to be
    robust to column order."""
    return left.unionByName(right)
