"""Extract machine-readable per-entry pins from BASELINE.md
(round-11 verdict task 4) into BASELINE_PINS.json.

Rules: table rows `| entry | <sec> ...` are pins; rows struck through
(~~…~~ SUPERSEDED) are skipped; LATER occurrences override earlier ones
(re-pin sections live at the end of the file); the section heading a
row sits under records provenance. Entries in the bench HEADLINE with
no pin are listed under "unpinned" so a new entry cannot dodge the
envelope silently.

Usage: python tools/gen_pins.py          # writes BASELINE_PINS.json
       python tools/gen_pins.py --check  # verify file is current
"""
from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


#: sections whose numeric tables are NOT seconds pins (scale factors,
#: regression ratios, A/B investigations) — rows there must never
#: override a pin (a 1.08 "factor" cell silently replacing a 0.18 s
#: pin would widen that entry's envelope 12x)
NON_PIN_SECTION_MARKERS = ("factor", "ratio", "aging", "a/b", "sweep")


def extract() -> dict:
    pins: dict[str, dict] = {}
    yard_round1: dict[str, dict] = {}
    section = ""
    row_re = re.compile(r"^\| ([a-z_0-9]+) \| ([0-9][0-9.]*)")
    sys.path.insert(0, REPO)
    from bench import HEADLINE, YARDSTICKS

    for i, line in enumerate(open(os.path.join(REPO, "BASELINE.md")), 1):
        if line.startswith("#"):
            section = line.strip("# \n")
            continue
        if "~~" in line and "SUPERSEDED" in line:
            continue
        sec_l = section.lower()
        if any(m in sec_l for m in NON_PIN_SECTION_MARKERS):
            continue
        m = row_re.match(line)
        if m:
            name, sec = m.group(1), float(m.group(2))
            pins[name] = {"sec": sec, "section": section, "line": i}
            # calibration-creep denominators are the FIRST (round-1)
            # yardstick pins: a later re-pin row must not re-baseline
            # them or a real catalog-wide slowdown reads as creep ~1.0
            if name in YARDSTICKS and name not in yard_round1:
                yard_round1[name] = {"sec": sec, "line": i}

    headline = list(HEADLINE)
    # cold/warm split entries are timed under derived names
    timed = set(headline) - {"hypertable_rollup"} | {
        "hypertable_rollup_cold", "hypertable_rollup_warm"}
    unpinned = sorted(timed - set(pins))
    stale_pins = sorted(set(pins) - timed - {"hypertable_rollup"})
    return {"pins": pins, "yardstick_round1_pins": yard_round1,
            "unpinned": unpinned, "not_in_headline": stale_pins}


def main() -> int:
    out = extract()
    path = os.path.join(REPO, "BASELINE_PINS.json")
    blob = json.dumps(out, indent=1, sort_keys=True) + "\n"
    if "--check" in sys.argv:
        if not os.path.exists(path) or open(path).read() != blob:
            print("BASELINE_PINS.json is stale — rerun tools/gen_pins.py")
            return 1
        print("BASELINE_PINS.json current")
        return 0
    open(path, "w").write(blob)
    print(f"{len(out['pins'])} pins, unpinned={out['unpinned']}, "
          f"not_in_headline={out['not_in_headline']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
