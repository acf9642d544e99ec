"""Alternating A/B for the components-seeding change (round-12
session 3): same JVM, identical persisted pair input, incumbent
`connected_components` vs a seeded variant whose label table starts at
min(node, min-neighbor) — the exact state after the incumbent's round
1 — so one full fixpoint round (2 joins + localCheckpoint + count job)
collapses into the init groupBy.

Prints per-variant round counts, output-hash equality, and alternating
entry-level timings for the four components-dominated bench entries.

Usage: python tools/ab_components_seed.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(args[1]) if len(args) > 1 else 5
    extra = args[2:]

    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    spark = get_spark("ab-components-seed")
    spark.range(1).count()

    entries = extra or [
        "dedup_components",
        "dedup_prune",
        "dedup_prune_priority",
        "curation_pipeline",
    ]

    # entry-level alternating A/B is driven by an env flag the operator
    # reads (HSTREAM_COMPONENTS_SEED) so both variants run in this JVM
    out: dict[str, dict] = {}
    for name in entries:
        q = REGISTRY[name]
        times: dict[str, list[float]] = {"incumbent": [], "seeded": []}
        for r in range(reps):
            for variant, flag in (("incumbent", "0"), ("seeded", "1")):
                os.environ[os.environ.get("HSTREAM_AB_FLAG", "HSTREAM_COMPONENTS_SEED")] = flag
                start = time.perf_counter()
                q.builder(spark, sf_dir).write.mode("overwrite").format(
                    "noop").save()
                times[variant].append(time.perf_counter() - start)
                spark.catalog.clearCache()
        out[name] = {
            v: {
                "median": round(statistics.median(ts), 3),
                "best": round(min(ts), 3),
                "all": [round(t, 3) for t in ts],
            }
            for v, ts in times.items()
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
