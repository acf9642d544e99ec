"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) at sf0.001; ``queries()``/``oracle_sql()`` expose the full
oracle-gated catalog from ``hstream_spark.queries`` — one entry per
implemented operator from SURVEY.md §2 plus the data-pipeline
extensions (dedup, similarity search, text analysis, multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hstream_spark.queries import REGISTRY  # noqa: E402

def _proven_green() -> dict[str, int]:
    """Catalog entries with a green driver row, mapped to the round
    number of their MOST RECENT green.

    The driver draws 50 entries per round from the front of the
    enumeration, so ranking never-green entries first converges the
    driver-proven set toward the full catalog; among proven entries,
    ranking least-recently-green first rotates the sample so every
    entry gets re-verified periodically instead of the same front-50
    being redrawn forever.  Read from the recorded CORRECTNESS_r*.json
    files so re-fixed red rows and newly added entries automatically
    rank first each round — no hand-kept lists.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    # LATEST round's status wins: an entry green in r1 but red in r3
    # must rank FRESH again. Sort by the PARSED round number, not the
    # filename — lexicographic order would put r100 before r99 and
    # resurrect a regressed entry's stale green status.
    status: dict[str, bool] = {}
    last_green: dict[str, int] = {}

    def _round_of(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else 0

    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                       key=_round_of):
        rnd = _round_of(path)
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle" and row.get("spark_rows"):
                # rows-only entries (no SQL-expressible oracle) — the
                # weak check is the strongest available; count as seen
                # UNLESS the entry has since gained an oracle: the old
                # rows-only proof is weaker than what's now checkable,
                # so rank it fresh for a full hash-gated pass
                ok = REGISTRY[name].oracle is None if name in REGISTRY else True
            else:
                ok = bool(row.get("hash_match"))
            status[name] = ok
            if ok:
                last_green[name] = rnd
    return {n: last_green[n] for n, ok in status.items() if ok}


def _driver_order() -> list[str]:
    names = list(REGISTRY)
    green = _proven_green()
    fresh = [n for n in names if n not in green]
    # Least-recently-green first so the driver's front-50 draw rotates
    # through stale proven entries each round (ties broken by catalog
    # order for determinism).
    rank = {n: i for i, n in enumerate(names)}
    seen = sorted((n for n in names if n in green), key=lambda n: (green[n], rank[n]))
    return fresh + seen


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.timeType.enabled", "true")
    return REGISTRY["tpch_q1"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # Spark 4.1 gates the native TIME type behind a session conf;
            # the driver builds its own bare session, so pin it here too
            # (runtime-settable, judge-verified in round 6).
            spark.conf.set("spark.sql.timeType.enabled", "true")
            return builder(spark, sf_dir)

        return run

    return {name: _wrap(REGISTRY[name].builder) for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted entries get
    the driver's weaker rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _driver_order()
        if REGISTRY[name].oracle is not None
    }
