"""Property-based scalar-function tests (hypothesis) — invariants the
reference's example-based specs can't pin. Each property evaluates ONE
Spark job over a DataFrame of all generated examples (per-example jobs
would be prohibitively slow)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hstream_spark.functions import scalar as S

# plain ASCII-ish text keeps the string properties about SEMANTICS, not
# about unicode grapheme/codepoint mismatches between Python and the JVM
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
N = st.integers(min_value=0, max_value=50)


def run_batch(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=5, deadline=None)
@given(data=st.lists(st.tuples(N, TEXT), min_size=1, max_size=60))
def test_take_drop_partition_string(spark, data):
    """TAKE(n, s) ++ DROP(n, s) == s and TAKEEND/DROPEND mirror it —
    the declared semantics the reference implements wrong (SEMANTICS.md)."""
    rows = [(n, s) for n, s in data]
    out = run_batch(
        spark, rows, "n int, s string",
        F.struct(
            S.take(F.col("n"), F.col("s")).alias("t"),
            S.drop(F.col("n"), F.col("s")).alias("d"),
            S.takeend(F.col("n"), F.col("s")).alias("te"),
            S.dropend(F.col("n"), F.col("s")).alias("de"),
        ),
    )
    for (n, s), r in zip(rows, out):
        assert r["t"] + r["d"] == s
        assert r["de"] + r["te"] == s
        assert r["t"] == s[:n]
        assert r["te"] == (s[-n:] if n else "")


@settings(max_examples=5, deadline=None)
@given(data=st.lists(st.tuples(st.integers(1, 10), TEXT), min_size=1, max_size=60))
def test_chunksof_reassembles(spark, data):
    """CHUNKSOF(n, s) concatenates back to s; every chunk but the last
    has exactly n chars (BinOp.hs:274-278 declared behavior)."""
    out = run_batch(
        spark, [(n, s) for n, s in data], "n int, s string",
        S.chunksof(F.col("n"), F.col("s")),
    )
    for (n, s), chunks in zip(data, out):
        assert "".join(chunks) == s
        assert all(len(c) == n for c in chunks[:-1])
        if s:
            assert 1 <= len(chunks[-1]) <= n


@settings(max_examples=5, deadline=None)
@given(data=st.lists(st.lists(st.integers(-100, 100), max_size=12), min_size=1, max_size=60))
def test_array_distinct_sort_invariants(spark, data):
    """ARRAY_DISTINCT keeps first-occurrence order (Haskell nub);
    ARRAY_SORT is an ordered permutation."""
    rows = [(xs,) for xs in data]
    out = run_batch(
        spark, rows, "xs array<int>",
        F.struct(
            F.array_distinct(F.col("xs")).alias("d"),
            S.array_sort_(F.col("xs")).alias("s"),
        ),
    )
    for (xs,), r in zip(rows, out):
        seen, nub = set(), []
        for x in xs:
            if x not in seen:
                seen.add(x)
                nub.append(x)
        assert r["d"] == nub
        assert r["s"] == sorted(xs)


@settings(max_examples=5, deadline=None)
@given(data=st.lists(
    st.tuples(st.integers(-50, 50), st.integers(-50, 50), st.integers(-50, 50)),
    min_size=1, max_size=60,
))
def test_between_symmetric_orders_bounds(spark, data):
    """x BETWEEN SYMMETRIC a AND b == x between min(a,b) and max(a,b)
    (TerOp.hs:95-103)."""
    out = run_batch(
        spark, data, "x int, a int, b int",
        S.between_symmetric(F.col("x"), F.col("a"), F.col("b")),
    )
    for (x, a, b), r in zip(data, out):
        assert r == (min(a, b) <= x <= max(a, b))
