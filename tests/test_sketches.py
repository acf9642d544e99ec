"""Sketch aggregates: HLL distinct counts and GK quantiles.

These are approximate by design (engine-specific estimates, so the
driver's oracle gate runs rows-only on them); the accuracy contract —
the reason they're usable at 100 TB — is pinned here instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hstream_spark.queries import REGISTRY
from hstream_spark.sources.tables import load_table


def test_hll_within_relative_error(spark, sf_dir):
    out = {
        r.event_type: r.approx_users
        for r in REGISTRY["sketch_distinct_users"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.u
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert set(out) == set(exact)
    for k, est in out.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_gk_quantiles_within_rank_error(spark, sf_dir):
    approx = {
        r.event_type: (r.p50_approx, r.p95_approx)
        for r in REGISTRY["sketch_quantiles"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
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
