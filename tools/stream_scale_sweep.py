#!/usr/bin/env python
"""Streaming scale sweep (SCALE.md evidence, round 6): run the three
streaming throughput harnesses (map / reduce / join — bench.py's
bench_streaming) at sf0.1 (100k events) AND the 10x replica sf1
(1M events, tools/gen_scale_data.py), recording records/s and trigger
latency at both scale factors. Throughput should HOLD or improve at
10x input (bigger micro-batches amortize per-trigger overhead); a
collapse flags state-store or shuffle pathology.

Usage: python tools/stream_scale_sweep.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from hstream_spark import get_spark

    import bench

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_small = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.1")
    sf_big = os.environ.get("SCALE_BIG", os.path.join(repo, ".scale", "sf1"))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".scale", "stream_sweep.json"
    )
    spark = get_spark("stream-scale-sweep")
    spark.range(1).count()
    results: dict[str, dict] = {}
    for label, sf in (("sf0.1", sf_small), ("sf1", sf_big)):
        if not os.path.isdir(sf):
            print(f"skip {label}: {sf} missing (run tools/gen_scale_data.py)")
            continue
        results[label] = bench.bench_streaming(spark, sf)
        print(label, json.dumps(results[label]))
    if "sf0.1" in results and "sf1" in results:
        summary = {}
        for h in ("map", "reduce", "join"):
            a, b = results["sf0.1"][h], results["sf1"][h]
            summary[h] = {
                "rps_sf0.1": a["records_per_sec"],
                "rps_sf1": b["records_per_sec"],
                "rps_ratio": round(
                    b["records_per_sec"] / a["records_per_sec"], 2
                ),
                "steady_ms_sf0.1": a["trigger_ms_steady"],
                "steady_ms_sf1": b["trigger_ms_steady"],
            }
        results["summary"] = summary
        print("summary", json.dumps(summary))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
