"""Standalone timer for the MinHash standing-index family (round-12
verdict task 1): fresh session, bench methodology (noop sink, N runs,
min), one family entry after a warm-up control. Prints one JSON line.

Usage: python tools/ab_family.py [sf_dir] [entry ...]
"""
import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    entries = [a for a in args if not os.path.isdir(a)] or [
        "dedup_minhash_lsh",
        "lsh_bucket_stats",
        "similar_docs_topk",
        "dedup_against_index",
        "dedup_against_index_warm",
        "lsh_recall_eval",
    ]
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    spark = get_spark("ab-family")
    spark.range(1).count()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    out = {}
    for name in entries:
        q = REGISTRY[name]
        best = float("inf")
        for _ in range(max(1, runs)):
            start = time.perf_counter()
            q.builder(spark, sf_dir).write.mode("overwrite").format(
                "noop").save()
            best = min(best, time.perf_counter() - start)
        out[name] = round(best, 3)
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()
