"""Bisect which sweep prefix slows the MinHash family (verdict task 1).

Runs HEADLINE[a:b] at sf0.1 (the real sweep's data scale — sf0.001
aging does NOT reproduce), then times probe entries, reporting GC-time
delta during the probe window and any RDD blocks still in the block
manager (localCheckpoint survivors that clearCache() cannot drop).

Usage: python tools/ab_bisect.py A B [probe ...]
"""
import json
import os
import sys
import time

PROBES = ["lsh_bucket_stats", "similar_docs_topk"]


_JVM_PID = None


def jvm_cpu_s(spark) -> float:
    """JVM process CPU seconds (utime+stime, all threads) via /proc —
    steal-insensitive: distinguishes 'more work' from 'more waiting'."""
    global _JVM_PID
    if _JVM_PID is None:
        name = str(
            spark._jvm.java.lang.management.ManagementFactory
            .getRuntimeMXBean().getName())
        _JVM_PID = int(name.split("@")[0])
    parts = open(f"/proc/{_JVM_PID}/stat").read().rsplit(")", 1)[1].split()
    hz = os.sysconf("SC_CLK_TCK")
    return round((int(parts[11]) + int(parts[12])) / hz, 2)


def gc_ms(spark) -> int:
    mf = spark._jvm.java.lang.management.ManagementFactory
    it = mf.getGarbageCollectorMXBeans().iterator()
    total = 0
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total


def heap_mb(spark) -> float:
    mf = spark._jvm.java.lang.management.ManagementFactory
    return round(mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() / 1e6, 1)


def rdd_storage(spark) -> list:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return [
        {"id": i.id(), "name": str(i.name())[:40],
         "mem_mb": round(i.memSize() / 1e6, 1),
         "parts": i.numCachedPartitions()}
        for i in infos
    ]


def main() -> None:
    a, b = int(sys.argv[1]), int(sys.argv[2])
    probes = sys.argv[3:] or PROBES
    sf_big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    here = os.path.dirname(os.path.abspath(globals().get("__file__", ".")))
    sys.path.insert(0, os.path.join(here, ".."))
    from bench import HEADLINE as headline

    spark = get_spark("ab-bisect")
    spark.range(1).count()
    # JIT warm-up on the probes so young-vs-aged isn't confounded
    for name in probes:
        REGISTRY[name].builder(spark, sf_big).write.mode("overwrite").format(
            "noop").save()
        spark.catalog.clearCache()

    def snapshot(tag: str, rec: dict) -> None:
        rec[f"{tag}_confs"] = sorted(
            f"{r.key}={r.value}" for r in spark.sql("SET").collect())
        df = REGISTRY[probes[0]].builder(spark, sf_big)
        rec[f"{tag}_plan"] = df._jdf.queryExecution().optimizedPlan().toString()
        jvm_cpu_s(spark)  # resolve pid
        smaps = {}
        for line in open(f"/proc/{_JVM_PID}/smaps_rollup"):
            k = line.split(":")[0]
            if k in ("Rss", "AnonHugePages"):
                smaps[k] = int(line.split()[1]) // 1024  # MB
        rec[f"{tag}_smaps_mb"] = smaps

    def time_probes(tag: str, rec: dict) -> None:
        for name in probes:
            g0, c0, t0 = gc_ms(spark), jvm_cpu_s(spark), time.perf_counter()
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                REGISTRY[name].builder(spark, sf_big).write.mode(
                    "overwrite").format("noop").save()
                best = min(best, time.perf_counter() - start)
            rec[f"{tag}_{name}"] = round(best, 3)
            rec[f"{tag}_{name}_gc_ms"] = gc_ms(spark) - g0
            rec[f"{tag}_{name}_cpu_s"] = round(jvm_cpu_s(spark) - c0, 2)
            rec[f"{tag}_{name}_wall"] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()

    jvm_args = list(
        spark._jvm.java.lang.management.ManagementFactory
        .getRuntimeMXBean().getInputArguments())
    rec = {"range": [a, b],
           "jit_flags": [x for x in jvm_args if "Recompilation" in x]}
    snapshot("young", rec)
    if os.environ.get("AB_JFR_YOUNG"):
        import subprocess
        jvm_cpu_s(spark)
        subprocess.run(["jcmd", str(_JVM_PID), "JFR.start", "name=youngp",
                        "settings=profile"], capture_output=True)
        time_probes("young", rec)
        subprocess.run(["jcmd", str(_JVM_PID), "JFR.dump", "name=youngp",
                        "filename=" + os.environ["AB_JFR_YOUNG"]],
                       capture_output=True)
        subprocess.run(["jcmd", str(_JVM_PID), "JFR.stop", "name=youngp"],
                       capture_output=True)
    else:
        time_probes("young", rec)
    rec["heap_young"] = heap_mb(spark)

    errs = {}
    t0 = time.perf_counter()
    for name in headline[a:b]:
        if name in probes:
            continue
        try:
            REGISTRY[name].builder(spark, sf_big).write.mode(
                "overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            errs[name] = type(exc).__name__
        spark.catalog.clearCache()
    rec["age_sec"] = round(time.perf_counter() - t0, 1)
    rec["age_errors"] = errs
    rec["rdd_blocks"] = rdd_storage(spark)
    rec["heap_aged"] = heap_mb(spark)
    snapshot("aged", rec)
    if os.environ.get("AB_JFR_AGED"):
        import subprocess
        jvm_cpu_s(spark)  # ensure pid resolved
        subprocess.run(["jcmd", str(_JVM_PID), "JFR.start", "name=agedp",
                        "settings=profile"], capture_output=True)
        time_probes("aged", rec)
        subprocess.run(["jcmd", str(_JVM_PID), "JFR.dump", "name=agedp",
                        "filename=" + os.environ["AB_JFR_AGED"]],
                       capture_output=True)
        subprocess.run(["jcmd", str(_JVM_PID), "JFR.stop", "name=agedp"],
                       capture_output=True)
    else:
        time_probes("aged", rec)
    for name in probes:
        rec[f"ratio_{name}"] = round(
            rec[f"aged_{name}"] / rec[f"young_{name}"], 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
