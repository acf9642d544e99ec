"""Sketch aggregates: HLL distinct counts and GK quantiles.

The estimates are approximate by design (engine-specific values), so
since round 8 the catalog entries EMIT their accuracy contract as
per-group booleans the DuckDB oracle asserts (hash-gated). These tests
pin the same contracts independently — directly against the raw
sketches — plus the entry-level invariant columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hstream_spark.queries import REGISTRY
from hstream_spark.sources.tables import load_table


def test_hll_within_relative_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.est - r.exact) / r.exact < 0.05, (r.event_type, r.est, r.exact)


def test_hll_entry_emits_true_invariants(spark, sf_dir):
    out = REGISTRY["sketch_distinct_users"].builder(spark, sf_dir).collect()
    assert out and all(r.within_bound for r in out)
    # exact side really is exact (cross-checked against a plain count)
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.u
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert {r.event_type: r.exact_users for r in out} == exact


def test_gk_quantiles_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: (r.q[0], r.q[1])
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95], 10000).alias("q"))
        .collect()
    }
    for etype, (p50, p95) in approx.items():
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        # percentile_approx guarantees rank error <= n/accuracy; with
        # accuracy=10000 and small n this is exact-rank up to rounding —
        # allow a +-1% rank window.
        for p, got in ((0.5, p50), (0.95, p95)):
            lo = vals[max(0, int((p - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((p + 0.01) * n) + 1)]
            assert lo <= got <= hi, (etype, p, got, lo, hi)


def test_gk_entry_emits_true_invariants(spark, sf_dir):
    out = REGISTRY["sketch_quantiles"].builder(spark, sf_dir).collect()
    assert out and all(r.p50_rank_ok and r.p95_rank_ok for r in out)
