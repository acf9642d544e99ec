"""Golden-plan dialect tests — the SQL frontend must apply the
documented dialect choices (SEMANTICS.md) in the PLAN it emits, not
just in hand-built DataFrames. Mirrors the reference's plan-snapshot
suite (hstream-sql/etc/plan-test-cases.yaml: parse SQL → assert the
logical plan), with the Spark analyzed plan as the snapshot surface.

Dialect rows under test:
- `=` / `<>` are null-safe (Codegen/BinOp.hs:116-118,136-138):
  NULL = NULL → TRUE, compiled to Spark's `<=>`.
- COUNT(e) skips NULLs (declared SQL semantics; the reference counts
  them, AggOp.hs:68-71 — a documented divergence), COUNT(*) counts all.
- NOT BETWEEN SYMMETRIC (plan-test-cases.yaml:5-12 `not(BETWEEN)`)
  normalizes bounds then negates.
"""

from __future__ import annotations

import pytest

from hstream_spark.plans.compiler import compile_select
from hstream_spark.plans.parser import parse


@pytest.fixture(scope="module")
def s_df(spark):
    return spark.createDataFrame(
        [(1, 1), (2, None), (None, None), (50, 3)],
        "x long, y long",
    )


def _plan(spark, s_df, sql: str) -> str:
    stmt = parse(sql)
    df = compile_select(stmt, lambda name: s_df.alias(name))
    return df._jdf.queryExecution().analyzed().toString(), df


def test_equality_compiles_to_null_safe(spark, s_df):
    plan, df = _plan(spark, s_df, "SELECT x = y AS e FROM s;")
    assert "<=>" in plan, plan
    # NULL = NULL → TRUE, NULL = x → FALSE (never NULL)
    vals = [r["e"] for r in df.collect()]
    assert vals == [True, False, True, False]


def test_inequality_is_negated_null_safe(spark, s_df):
    plan, df = _plan(spark, s_df, "SELECT x <> y AS e FROM s;")
    assert "<=>" in plan and "NOT" in plan, plan
    vals = [r["e"] for r in df.collect()]
    assert vals == [False, True, False, True]


def test_count_col_skips_nulls_count_star_does_not(spark, s_df):
    _, df = _plan(spark, s_df, "SELECT COUNT(y) AS cy, COUNT(*) AS call FROM s;")
    row = df.collect()[0]
    # declared SQL semantics (SEMANTICS.md): the reference's count-NULLs
    # behavior (AggOp.hs:68-71) is a bug we deliberately do not follow
    assert row["cy"] == 2
    assert row["call"] == 4


def test_not_between_symmetric_plan_and_values(spark, s_df):
    # the reference's own `not(BETWEEN)` golden case
    # (plan-test-cases.yaml:5-12): OpNotBetweenSymAnd(#(x), 0, 42)
    plan, df = _plan(
        spark, s_df, "SELECT x NOT BETWEEN SYMMETRIC 42 AND 0 AS e FROM s;"
    )
    assert "NOT" in plan, plan
    vals = [r["e"] for r in df.collect()]
    # bounds normalize (42,0)→[0,42]: 1,2 inside → False; NULL → NULL;
    # 50 outside → True
    assert vals == [False, False, None, True]


def test_ifnull_nullif_dialect(spark, s_df):
    _, df = _plan(
        spark,
        s_df,
        "SELECT IFNULL(y, -1) AS y0, NULLIF(x, 1) AS xn FROM s;",
    )
    rows = [(r["y0"], r["xn"]) for r in df.collect()]
    assert rows == [(1, None), (-1, 2), (-1, None), (3, 50)]
