"""Vanilla-session parity sweep: the driver-gate hazard class 4 guard.

The correctness driver builds its OWN bare SparkSession — none of
``hstream_spark.session._DEFAULTS`` apply — and runs catalog entries
through the ``_wrap`` closure in ``__spark_entry__.py``, which sets a
small, explicit list of session confs.  Any catalog entry that silently
depends on a ``session.py`` default (round 6's ``time_type_ops`` red:
``spark.sql.timeType.enabled``) analyzes fine in tests and the strict
mirror but goes red at the driver.

This sweep reproduces the driver's environment exactly: a bare session
(only ``master`` set) + whatever ``__spark_entry__.queries()``'s wrapper
itself applies, then ANALYZES every catalog entry (``.schema`` — no
execution) so conf-dependent analysis errors surface for the whole
catalog in one pass.

Run standalone::

    python tools/vanilla_session_check.py [sf_dir]

or via ``tests/test_driver_session_parity.py`` (subprocess — a truly
bare JVM-side conf requires a fresh session; ``newSession()`` would
inherit builder-time SparkConf entries from the test session).
"""

from __future__ import annotations

import os
import sys
import traceback


def main(sf_dir: str) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    # Bare, driver-like session: no session.py defaults.  local[4] is
    # plenty — nothing executes, analysis only.
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-session-parity")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    failures: list[tuple[str, str]] = []
    for name, builder in queries.items():
        try:
            df = builder(spark, sf_dir)
            _ = df.schema  # forces analysis; no job runs
        except Exception:  # noqa: BLE001 — report every analysis error
            failures.append((name, traceback.format_exc(limit=3)))

    print(f"analyzed {len(queries)} catalog entries on a bare session")
    if failures:
        for name, tb in failures:
            print(f"FAIL {name}\n{tb}", file=sys.stderr)
        print(f"{len(failures)} entries depend on non-driver session confs")
        return 1
    print("all entries analyze clean without session.py defaults")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
