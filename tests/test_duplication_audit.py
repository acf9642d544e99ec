"""Unit tests for tools/audit_duplication.py plan-string analysis.

Pure-string tests (no Spark session): the IMR-subtree stripper and the
per-entry count extraction the ratchet gate runs on.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "audit_duplication",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "audit_duplication.py"),
)
audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(audit)


PLAN_WITH_IMR = """\
Project [doc_id#1L, split(text#2,  , -1) AS toks#3]
+- Join Inner, (a#4 = b#5)
   :- InMemoryRelation [doc_id#1L, hs#6], StorageLevel(disk, memory)
   :     +- AdaptiveSparkPlan
   :        +- Project [md5(cast(x#7 as binary)) AS h#8]
   :           +- Relation [doc_id#1L, text#2] parquet
   +- Filter (size(split(text#9,  , -1), true) > 1)
      +- Relation [doc_id#9L, text#9] parquet
"""


def test_strip_cached_subtrees_drops_imr_children():
    s = audit.strip_cached_subtrees(PLAN_WITH_IMR)
    # the md5 and the Relation under the IMR are gone
    assert "md5(" not in s
    assert s.count("Relation [") == 1
    # nodes outside the IMR (same or shallower indent after it) survive
    assert s.count("split(") == 2
    assert "Filter" in s


def test_entry_counts_fields():
    r = audit.entry_counts(PLAN_WITH_IMR)
    assert r["heads"] == {"split": 2}
    assert r["worst"] == 2
    # only the Filter line's split counts as in-filter
    assert r["in_filter"] == 1
    assert r["scans"] == 1


def test_entry_counts_extract_vs_extract_all_disambiguation():
    plan = (
        "Project [regexp_extract_all(t#1, p, 0) AS a#2, "
        "regexp_extract(t#1, p, 1) AS b#3]\n"
        "+- Relation [t#1] parquet\n"
    )
    r = audit.entry_counts(plan)
    assert r["heads"]["regexp_extract_all"] == 1
    assert r["heads"]["regexp_extract"] == 1


def test_imr_then_sibling_branch_not_swallowed():
    plan = (
        "Join Inner\n"
        ":- InMemoryRelation [a#1]\n"
        ":     +- Project [split(t#2,  , -1) AS x#3]\n"
        ":        +- Relation [t#2] parquet\n"
        "+- Project [split(u#4,  , -1) AS y#5]\n"
        "   +- Relation [u#4] parquet\n"
    )
    r = audit.entry_counts(plan)
    assert r["heads"] == {"split": 1}
    assert r["scans"] == 1
