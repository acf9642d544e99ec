"""JFR-profile the family probe on a young vs aged session (task 1).

Records jdk.ExecutionSample during one probe run before and after aging
the session with HEADLINE[0:N] at sf0.1, dumps two .jfr files, and
prints the top frames of each so the extra CPU is attributable.
"""
import json
import os
import subprocess
import sys
import time


def jcmd(pid: int, *args: str) -> str:
    return subprocess.run(
        ["jcmd", str(pid), *args], capture_output=True, text=True
    ).stdout


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 156
    probe = sys.argv[2] if len(sys.argv) > 2 else "lsh_bucket_stats"
    sf_big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(globals().get("__file__", "."))), ".."))
    from bench import HEADLINE as headline

    spark = get_spark("ab-jfr")
    spark.range(1).count()
    pid = int(str(
        spark._jvm.java.lang.management.ManagementFactory
        .getRuntimeMXBean().getName()).split("@")[0])

    def run_probe() -> float:
        start = time.perf_counter()
        REGISTRY[probe].builder(spark, sf_big).write.mode(
            "overwrite").format("noop").save()
        sec = time.perf_counter() - start
        spark.catalog.clearCache()
        return round(sec, 3)

    rec = {"n": n, "probe": probe}
    run_probe()  # JIT warm
    jcmd(pid, "JFR.start", "name=young", "settings=profile")
    rec["young_sec"] = run_probe()
    jcmd(pid, "JFR.dump", "name=young", "filename=/tmp/young.jfr")
    jcmd(pid, "JFR.stop", "name=young")

    errs = {}
    for name in headline[:n]:
        if name == probe:
            continue
        try:
            REGISTRY[name].builder(spark, sf_big).write.mode(
                "overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            errs[name] = type(exc).__name__
        spark.catalog.clearCache()
    rec["age_errors"] = errs

    run_probe()  # first aged run (post-age JIT settle)
    jcmd(pid, "JFR.start", "name=aged", "settings=profile")
    rec["aged_sec"] = run_probe()
    jcmd(pid, "JFR.dump", "name=aged", "filename=/tmp/aged.jfr")
    jcmd(pid, "JFR.stop", "name=aged")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
