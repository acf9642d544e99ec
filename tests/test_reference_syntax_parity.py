"""Dialect parity against the reference's OWN syntax corpus
(hstream-sql/etc/syntax-test-cases.yaml), read at runtime from the
read-only reference checkout — nothing is copied into this repo. Every
statement the reference parser accepts must parse here too.

Deliberate tolerance (not asserted): we accept statements without a
trailing semicolon, which the reference rejects at EOF.
"""

from __future__ import annotations

import os

import pytest

REF_CORPUS = "/root/reference/hstream-sql/etc/syntax-test-cases.yaml"


@pytest.mark.skipif(not os.path.exists(REF_CORPUS), reason="reference checkout absent")
def test_reference_accepted_statements_all_parse():
    yaml = pytest.importorskip("yaml")
    from hstream_spark.plans.parser import parse

    cases = yaml.safe_load(open(REF_CORPUS))["testSuiteCases"]
    failures = []
    total = 0
    for c in cases:
        is_err = bool(c.get("testCaseFail")) or (
            (c.get("testCaseResult") or "").startswith("ParseException")
        )
        if is_err or c.get("testCaseResult") is None:
            continue
        for sql in c["testCaseStmts"]:
            total += 1
            try:
                parse(sql)
            except Exception as exc:
                failures.append((sql, str(exc)[:80]))
    assert total >= 40, f"corpus unexpectedly small: {total}"
    assert not failures, failures
