"""Full-HEADLINE sweep with JFR + per-entry wall/CPU timestamps
(task 1). Mirrors bench.py's execution shape (runs=2, min, noop sink,
clearCache between entries) and records, per entry: wall sec (min),
window epoch start/end, JVM CPU seconds across the window. JFR
(settings=profile) runs for the whole sweep → /tmp/sweep.jfr, so any
slow entry's execution samples can be pulled by its window.

Usage: python tools/ab_sweep_jfr.py [start_idx] [end_idx]
"""
import json
import os
import subprocess
import sys
import time


def main() -> None:
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    b = int(sys.argv[2]) if len(sys.argv) > 2 else None
    sf_big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(globals().get("__file__", "."))), ".."))
    from bench import HEADLINE
    headline = list(HEADLINE)[a:b]

    spark = get_spark("ab-sweep")
    spark.range(1).count()
    pid = int(str(
        spark._jvm.java.lang.management.ManagementFactory
        .getRuntimeMXBean().getName()).split("@")[0])
    hz = os.sysconf("SC_CLK_TCK")

    def cpu_s() -> float:
        parts = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / hz

    subprocess.run(["jcmd", str(pid), "JFR.start", "name=sweep",
                    "settings=profile", "maxsize=400m"],
                   capture_output=True)
    out = {}
    for name in headline:
        if name == "hypertable_rollup":
            from hstream_spark.queries import reset_hypertable_layout
            reset_hypertable_layout(sf_big)
        t0, c0 = time.time(), cpu_s()
        best = float("inf")
        err = None
        try:
            for _ in range(2):
                start = time.perf_counter()
                REGISTRY[name].builder(spark, sf_big).write.mode(
                    "overwrite").format("noop").save()
                best = min(best, time.perf_counter() - start)
        except Exception as exc:  # noqa: BLE001
            err = f"{type(exc).__name__}: {exc}"[:120]
        spark.catalog.clearCache()
        out[name] = {"sec": round(best, 3) if best < 1e9 else None,
                     "t0": round(t0, 2), "t1": round(time.time(), 2),
                     "cpu_s": round(cpu_s() - c0, 2)}
        if err:
            out[name]["error"] = err
    subprocess.run(["jcmd", str(pid), "JFR.dump", "name=sweep",
                    "filename=/tmp/sweep.jfr"], capture_output=True)
    subprocess.run(["jcmd", str(pid), "JFR.stop", "name=sweep"],
                   capture_output=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
