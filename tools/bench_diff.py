"""Per-query bench diff between two rounds' BENCH_DETAIL records.

Usage:
    python tools/bench_diff.py            # newest vs previous round
    python tools/bench_diff.py 9 10       # explicit rounds
    python tools/bench_diff.py FILE FILE  # arbitrary detail files

Prints a per-query ratio table (new/old wall seconds), both raw and
drift-adjusted (each record carries its own yardstick drift factor, so
the adjusted ratio divides out machine speed differences between the
two sessions), sorted worst-first, plus totals. Entries present in only
one record are listed separately. Round-9 verdict item 4: per-query
regression attribution must not depend on an untracked overwrite-in-
place file.
"""
from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _detail_path(arg: str) -> str:
    if os.path.exists(arg):
        return arg
    return os.path.join(REPO, f"BENCH_DETAIL_r{int(arg):02d}.json")


def _latest_rounds() -> tuple[str, str]:
    rounds = sorted(
        int(m.group(1)) for f in os.listdir(REPO)
        if (m := re.fullmatch(r"BENCH_DETAIL_r(\d+)\.json", f))
    )
    if len(rounds) >= 2:
        return str(rounds[-2]), str(rounds[-1])
    if len(rounds) == 1:
        # fall back to the overwrite-in-place sidecar as "new"
        return str(rounds[-1]), os.path.join(REPO, "BENCH_DETAIL.json")
    raise SystemExit("no BENCH_DETAIL_r*.json records found")


def main() -> None:
    args = sys.argv[1:]
    if len(args) == 2:
        old_p, new_p = _detail_path(args[0]), _detail_path(args[1])
    elif not args:
        a, b = _latest_rounds()
        old_p, new_p = _detail_path(a), _detail_path(b)
    else:
        raise SystemExit(__doc__)
    with open(old_p) as f:
        old = json.load(f)
    with open(new_p) as f:
        new = json.load(f)
    od, nd = old.get("drift", {}).get("factor", 1.0), \
        new.get("drift", {}).get("factor", 1.0)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    rows = []
    for q in common:
        raw = nq[q] / oq[q] if oq[q] else float("inf")
        adj = raw * (od / nd) if nd else raw
        rows.append((adj, raw, q, oq[q], nq[q]))
    rows.sort(reverse=True)
    print(f"old: {os.path.basename(old_p)} total={old['value']}s "
          f"drift={od}  |  new: {os.path.basename(new_p)} "
          f"total={new['value']}s drift={nd}")
    print(f"{'query':38s} {'old_s':>8s} {'new_s':>8s} {'raw':>6s} {'adj':>6s}")
    for adj, raw, q, o, n in rows:
        flag = "  <-- regressed" if adj > 1.3 and n > 0.3 else ""
        print(f"{q:38s} {o:8.3f} {n:8.3f} {raw:6.2f} {adj:6.2f}{flag}")
    tot_o = sum(oq[q] for q in common)
    tot_n = sum(nq[q] for q in common)
    adj_t = (tot_n / tot_o) * (od / nd) if tot_o and nd else float("nan")
    print(f"\ncommon {len(common)} entries: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"(raw {tot_n / tot_o:.3f}x, drift-adj {adj_t:.3f}x)")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(f"{q} ({nq[q]:.3f}s)" for q in only_new))


if __name__ == "__main__":
    main()
