"""Golden syntax corpus replay — SQL → repr(AST) snapshots and expected
parse errors (the reference's golden parse-corpus pattern, SURVEY.md §5,
with our own cases). Regenerate after intentional parser changes with
tools/gen_syntax_corpus.py."""

from __future__ import annotations

import json
import os

import pytest

from hstream_spark.plans.parser import ParseError, parse

CORPUS = os.path.join(os.path.dirname(__file__), "golden_syntax.json")

with open(CORPUS) as fh:
    CASES = json.load(fh)


@pytest.mark.parametrize(
    "case", CASES, ids=[c["sql"][:48].replace(" ", "_") for c in CASES]
)
def test_golden_syntax(case):
    if "ast" in case:
        assert repr(parse(case["sql"])) == case["ast"]
    else:
        with pytest.raises(ParseError) as exc:
            parse(case["sql"])
        assert str(exc.value) == case["error"]
