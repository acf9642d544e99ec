#!/usr/bin/env python
"""Compact a standing dedup index built by
``hstream_spark.operators.dedup.build_dedup_index`` /
``append_to_dedup_index``.

Continuous ingestion appends parquet files per batch; this rewrite
re-clusters the band table (one file per band partition, preserving
partition pruning) and coalesces sets/digests, with optional
retention.

    python tools/compact_index.py /path/to/index [--target-files 4]

Prints the per-component file counts before/after as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="index root (contains bands/ sets/ digests/)")
    ap.add_argument("--target-files", type=int, default=4)
    args = ap.parse_args()

    from hstream_spark import get_spark
    from hstream_spark.operators.dedup import compact_dedup_index

    spark = get_spark("compact-index")
    try:
        stats = compact_dedup_index(
            spark, args.path, target_files=args.target_files
        )
    finally:
        spark.stop()
    print(json.dumps({"path": args.path, "components": stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
