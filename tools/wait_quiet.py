"""Block until the box shows a sustained quiet window (low steal, low
non-self busy), then exit 0 — a measurement gate for a host whose
hypervisor steal arrives in multi-minute storms (round-12 sessions
discarded five sweeps to them).

Usage: python tools/wait_quiet.py [max_wait_sec] [window_sec]
Exits 0 on quiet (prints the observed steal%), 1 on timeout.
"""
from __future__ import annotations

import sys
import time

STEAL_PCT_MAX = 0.3
CONSECUTIVE = 3


def _stat() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        vals = [int(x) for x in fh.readline().split()[1:]]
    return sum(vals[:8]), vals[7]


def main() -> int:
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
    window = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    deadline = time.time() + max_wait
    quiet = 0
    while time.time() < deadline:
        t0, s0 = _stat()
        time.sleep(window)
        t1, s1 = _stat()
        dt = t1 - t0
        steal = 100.0 * (s1 - s0) / dt if dt else 0.0
        if steal <= STEAL_PCT_MAX:
            quiet += 1
            if quiet >= CONSECUTIVE:
                print(f"quiet: steal {steal:.2f}% over {CONSECUTIVE} x "
                      f"{window:.0f}s windows")
                return 0
        else:
            quiet = 0
            print(f"contended: steal {steal:.2f}%", flush=True)
    print("timeout waiting for quiet window")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
