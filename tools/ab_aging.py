"""Session-aging reproducer for the MinHash family regression (round-12
verdict task 1).

Hypothesis: the family's in-sweep slowdown is JVM session aging (code
cache / metaspace / JIT churn after ~100+ compiled plans), not the
operators — the r9 tree and HEAD time identically standalone, and the
only discriminator between the regressed five and the non-regressed
control (`dedup_minhash_lsh`) is sweep position (104-157 vs 14).

Protocol (one process):
  1. time family at sf0.1 on the YOUNG session
  2. age: run the first AGE_N HEADLINE entries at sf0.001 (same codegen
     classes, tiny data — isolates plan/class accumulation from I/O)
  3. time family again on the AGED session
  4. report young/aged ratios + JVM code-heap & metaspace pool usage
     sampled at each phase
"""
import json
import os
import sys
import time


FAMILY = [
    "dedup_minhash_lsh",
    "lsh_bucket_stats",
    "similar_docs_topk",
    "dedup_against_index",
    "lsh_recall_eval",
]


def jvm_pools(spark) -> dict:
    mf = spark._jvm.java.lang.management.ManagementFactory
    out = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name:
            u = p.getUsage()
            out[name] = {
                "used_mb": round(u.getUsed() / 1e6, 1),
                "max_mb": round(u.getMax() / 1e6, 1),
            }
    return out


def time_family(spark, registry, sf_dir, runs=2) -> dict:
    out = {}
    for name in FAMILY:
        q = registry[name]
        best = float("inf")
        for _ in range(max(1, runs)):
            start = time.perf_counter()
            q.builder(spark, sf_dir).write.mode("overwrite").format(
                "noop").save()
            best = min(best, time.perf_counter() - start)
        out[name] = round(best, 3)
        spark.catalog.clearCache()
    return out


def main() -> None:
    age_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_small = "/root/testdata/sf0.001"
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from bench import HEADLINE as headline

    spark = get_spark("ab-aging")
    spark.range(1).count()
    rec = {"age_n": age_n}
    rec["pools_start"] = jvm_pools(spark)
    rec["young"] = time_family(spark, REGISTRY, sf_big)
    rec["pools_young"] = jvm_pools(spark)

    t0 = time.perf_counter()
    aged_err = {}
    for name in headline[:age_n]:
        if name in FAMILY:
            continue
        try:
            REGISTRY[name].builder(spark, sf_small).write.mode(
                "overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            aged_err[name] = type(exc).__name__
        spark.catalog.clearCache()
    rec["age_sec"] = round(time.perf_counter() - t0, 1)
    rec["age_errors"] = aged_err
    rec["pools_aged"] = jvm_pools(spark)
    rec["aged"] = time_family(spark, REGISTRY, sf_big)
    rec["pools_end"] = jvm_pools(spark)
    rec["ratio"] = {
        k: round(rec["aged"][k] / rec["young"][k], 2) for k in rec["young"]
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
