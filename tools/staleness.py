"""Catalog staleness gate (round-10 verdict item 7).

With ~163 catalog entries and 50 driver draws per round, an entry's
latest driver-green proof ages ~3 rounds between draws. This gate makes
that aging visible and bounds it: it reports each entry's last
driver-verified round (from CORRECTNESS_r*.json, latest-status-wins —
the same parse ``__spark_entry__._proven_green`` feeds the rotation
with) and FAILS if any entry's last green round is more than
``MAX_AGE`` rounds behind the newest correctness record.

Usage: python tools/staleness.py [--max-age N] [--markdown]

``--markdown`` prints the per-entry table for COVERAGE.md. Exit codes:
0 = all entries within the age bound, 1 = stale entries exist,
2 = entries that have never been driver-green. NOTE: a brand-new entry
registered after the newest correctness record also trips exit 2 until
its first driver draw — deliberately, since the correctness records
carry no registration dates to tell the two cases apart, and the
reminder ("sweep new entries locally before round end") is useful.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_AGE = 4


def last_green_rounds(repo: str) -> tuple[dict[str, int], int]:
    """(entry -> last driver-green round, newest round on disk).
    Latest-status-wins: a red in r5 voids a green in r3."""
    status: dict[str, bool] = {}
    last_green: dict[str, int] = {}
    newest = 0

    def _round_of(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else 0

    for path in sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")), key=_round_of
    ):
        rnd = _round_of(path)
        newest = max(newest, rnd)
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle" and row.get("spark_rows"):
                ok = True
            else:
                ok = bool(row.get("hash_match"))
            status[name] = ok
            if ok:
                last_green[name] = rnd
    # an entry red in its LATEST appearance is treated as never-green
    return (
        {n: r for n, r in last_green.items() if status.get(n)},
        newest,
    )


def main() -> int:
    argv = sys.argv[1:]
    max_age = MAX_AGE
    if "--max-age" in argv:
        i = argv.index("--max-age")
        max_age = int(argv[i + 1])
    markdown = "--markdown" in argv

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green, newest = last_green_rounds(repo)

    from hstream_spark.queries import REGISTRY

    stale, never = [], []
    rows = []
    for name in REGISTRY:
        r = green.get(name)
        age = (newest - r) if r is not None else None
        rows.append((name, r, age))
        if r is None:
            never.append(name)
        elif age > max_age:
            stale.append((name, r, age))

    if markdown:
        print("| entry | last driver-green round | age (rounds) |")
        print("|---|---|---|")
        for name, r, age in sorted(rows, key=lambda x: (-(x[2] or 999), x[0])):
            print(f"| {name} | {'never' if r is None else f'r{r}'} | "
                  f"{'-' if age is None else age} |")
        print()

    ages = [a for _, _, a in rows if a is not None]
    print(
        f"catalog={len(rows)} newest_round=r{newest} "
        f"max_age_gate={max_age} "
        f"worst_age={max(ages) if ages else '-'} "
        f"median_age={sorted(ages)[len(ages) // 2] if ages else '-'}"
    )
    if stale:
        print(f"STALE ({len(stale)} > {max_age} rounds):")
        for name, r, age in sorted(stale, key=lambda x: -x[2]):
            print(f"  {name}: last green r{r} (age {age})")
    if never:
        print(f"NEVER driver-green ({len(never)}): {', '.join(sorted(never))}")
        print("  (new entries are drawn first by the rotation; red-latest "
              "entries need a fix, not a draw)")
    if not stale and not never:
        print(f"OK: every entry driver-green within {max_age} rounds")
    return 1 if stale else (2 if never else 0)


if __name__ == "__main__":
    raise SystemExit(main())
