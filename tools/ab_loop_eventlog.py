"""Loop one family entry with spark.eventLog enabled (task 1): each
iteration records wall + JVM cpu_s; the event log yields per-stage
submission/completion walls and executor run/cpu/GC millis, so a slow
iteration attributes itself (stage skew vs driver gap vs external).

Usage: python tools/ab_loop_eventlog.py [iters] [entry]
"""
import glob
import json
import os
import sys
import time


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    entry = sys.argv[2] if len(sys.argv) > 2 else "lsh_bucket_stats"
    sf_big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/spark-events"
    import shutil
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    import hstream_spark.session as S
    S._DEFAULTS["spark.eventLog.enabled"] = "true"
    S._DEFAULTS["spark.eventLog.dir"] = "file:" + evdir
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    spark = get_spark("ab-loop")
    spark.range(1).count()
    pid = int(str(
        spark._jvm.java.lang.management.ManagementFactory
        .getRuntimeMXBean().getName()).split("@")[0])
    hz = os.sysconf("SC_CLK_TCK")

    def cpu_s() -> float:
        parts = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / hz

    def steal() -> int:
        return int(open("/proc/stat").readline().split()[8])

    runs = []
    for i in range(iters):
        t0, c0, s0 = time.time(), cpu_s(), steal()
        start = time.perf_counter()
        REGISTRY[entry].builder(spark, sf_big).write.mode(
            "overwrite").format("noop").save()
        wall = time.perf_counter() - start
        runs.append({"i": i, "wall": round(wall, 3),
                     "cpu_s": round(cpu_s() - c0, 2),
                     "steal_j": steal() - s0,
                     "t0": round(t0, 2), "t1": round(time.time(), 2)})
        spark.catalog.clearCache()
    spark.stop()
    time.sleep(2)

    # parse the event log: per-stage wall + executor metrics
    stages = []
    paths = [p for p in glob.glob(evdir + "/**/*", recursive=True)
             if os.path.isfile(p)]
    for path in paths:
        for line in open(path, errors="replace"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages.append({
                    "stage": si["Stage ID"],
                    "name": si["Stage Name"].split()[0][:40],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                })
    out = {"entry": entry, "runs": runs, "n_stages": len(stages)}
    # attach stages into their runs by time window
    for r in runs:
        mine = [s for s in stages
                if s["sub"] and r["t0"] * 1000 <= s["sub"] <= r["t1"] * 1000]
        mine.sort(key=lambda s: s["sub"])
        r["stages"] = [
            {"id": s["stage"], "tasks": s["tasks"],
             "wall": round((s["done"] - s["sub"]) / 1000, 2)}
            for s in mine]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
