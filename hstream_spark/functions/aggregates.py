"""Aggregate inventory of the HStream SQL dialect.

Reference: hstream-sql/src/HStream/SQL/Codegen/AggOp.hs (incremental
(init, step, merge) accumulators). Here every aggregate is a Catalyst
aggregate expression, so Spark gets hash aggregation with map-side
partial combine for free — the property that matters at 100 TB: the
shuffle carries one partial accumulator per (partition, key), never raw
rows.

Semantics policy (SEMANTICS.md): COUNT(col) skips NULLs and MAX/MIN are
NULL-initialized — the *declared* SQL semantics. The reference counts
NULLs (AggOp.hs:68-71) and initializes MAX/MIN accumulators to 0
(AggOp.hs:44-45), both plain bugs we do not replicate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

count_all = lambda: F.count(F.lit(1))  # COUNT(*) — AggOp.hs:38-39,53-58  # noqa: E731
count = F.count  # COUNT(e) — declared semantics (skip NULLs)
sum_ = F.sum  # SUM(e) int/float promoting — AggOp.hs:73-81
max_ = F.max  # AggOp.hs:83-91 (declared semantics)
min_ = F.min  # AggOp.hs:93-101
avg = F.avg  # parsed in the dialect; V1 runtime errors — we support it


def topk_of(collected: Column, k: int) -> Column:
    """The rank-and-cap half of TOPK: desc-sort an already-collected
    array and keep the first k. Shared by the plain aggregates below
    and the sliding range-frame path (which must attach ``.over`` to
    the collect aggregate ITSELF before wrapping) so the composition
    can't drift between call sites."""
    return F.slice(F.sort_array(collected, asc=False), 1, int(k))


def topk(value: Column, k: int) -> Column:
    """TOPK(val, k) — array of the k largest values (AggOp.hs:104-105,153-157).

    collect_list is a partial aggregate: each map task emits its local
    list, merged on the reduce side; for bounded k the dominant cost is
    the final sort. For very hot keys at scale prefer a windowed
    row_number rank (see queries.py top_orders_per_customer) so each
    partition only retains k rows.
    """
    return topk_of(F.collect_list(value), k)


def topkdistinct(value: Column, k: int) -> Column:
    """TOPKDISTINCT(val, k) — dedup before ranking (AggOp.hs:158-162)."""
    return topk_of(F.collect_set(value), k)
