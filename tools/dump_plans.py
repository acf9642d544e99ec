"""Dump ``.explain("formatted")`` for catalog entries to files.

Used to produce the committed ``plans/r12/<entry>_before.txt`` /
``_after.txt`` evidence: run once from an old-tree worktree (set
``HSTREAM_PLAN_REPO`` to the worktree root) with suffix ``before`` and
once from HEAD with suffix ``after``.

Usage::

    python tools/dump_plans.py OUTDIR SUFFIX entry [entry ...]

Environment:
    HSTREAM_PLAN_REPO       repo root to import the engine from
                            (default: parent of this file's directory)
    SPARK_GRAFT_SF_DIR_CHECK  data dir the plans are built against
                            (default /root/testdata/sf0.1 — the bench SF,
                            so plan claims line up with bench numbers)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.environ.get("HSTREAM_PLAN_REPO") or os.path.dirname(_HERE)
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.1")


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from hstream_spark import get_spark
    from hstream_spark.queries import REGISTRY

    spark = get_spark("plan-dump")
    rc = 0
    for name in names:
        if name not in REGISTRY:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            rc = 1
            continue
        try:
            df = REGISTRY[name].builder(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure in-file
            text = f"ERROR building {name}: {exc!r}\n"
            rc = 1
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {suffix} (sf dir {SF_DIR})\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
