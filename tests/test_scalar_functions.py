"""Per-function scalar specs — ports of the reference's unit-test style
(hstream-sql/test/HStream/SQL/Codegen/MathSpec.hs, ArraySpec.hs) onto a
single literal row, as in FIXTURES.md §4."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hstream_spark.functions import scalar as S


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


class TestNullSemantics:
    def test_null_safe_eq(self, spark):
        assert one(spark, S.eq(F.lit(None), F.lit(None))) is True
        assert one(spark, S.eq(F.lit(None).cast("int"), F.lit(1))) is False
        assert one(spark, S.neq(F.lit(None), F.lit(None))) is False

    def test_comparison_null_propagates(self, spark):
        assert one(spark, F.lit(None).cast("int") < F.lit(1)) is None

    def test_arith_null_propagates(self, spark):
        assert one(spark, F.lit(None).cast("int") + F.lit(1)) is None


class TestMath:
    def test_add_mixed_promotes(self, spark):
        assert one(spark, F.lit(1) + F.lit(2)) == 3
        assert one(spark, F.lit(1) + F.lit(2.5)) == 3.5

    def test_floor_ceil_round_sign_are_ints(self, spark):
        assert one(spark, S.floor(F.lit(1.5))) == 1
        assert one(spark, S.ceil(F.lit(1.5))) == 2
        # Haskell `round` is half-even: round 2.5 == 2
        assert one(spark, S.round_(F.lit(2.5))) == 2
        assert one(spark, S.round_(F.lit(3.5))) == 4
        assert one(spark, S.sign(F.lit(-3.2))) == -1

    def test_exp_log(self, spark):
        assert one(spark, S.log_(F.lit(math.e))) == pytest.approx(1.0)
        assert one(spark, S.log2(F.lit(8.0))) == pytest.approx(3.0)
        assert one(spark, S.sqrt(F.lit(9.0))) == pytest.approx(3.0)


class TestStrings:
    def test_take_drop_family(self, spark):
        s = F.lit("abcdef")
        assert one(spark, S.take(2, s)) == "ab"
        assert one(spark, S.takeend(2, s)) == "ef"
        assert one(spark, S.drop(2, s)) == "cdef"
        assert one(spark, S.dropend(2, s)) == "abcd"
        assert one(spark, S.dropend(9, s)) == ""

    def test_chunksof(self, spark):
        assert one(spark, S.chunksof(2, F.lit("abcde"))) == ["ab", "cd", "e"]

    def test_split_literal_delim(self, spark):
        assert one(spark, S.split(".", F.lit("a.b.c"))) == ["a", "b", "c"]

    def test_trim_reverse_len(self, spark):
        assert one(spark, S.trim(F.lit("  x "))) == "x"
        assert one(spark, S.reverse_(F.lit("abc"))) == "cba"
        assert one(spark, S.strlen(F.lit("abc"))) == 3


class TestArrays:
    def test_array_ops(self, spark):
        arr = F.array(F.lit(3), F.lit(1), F.lit(3), F.lit(2))
        other = F.array(F.lit(2))
        assert one(spark, S.array_distinct_(arr)) == [3, 1, 2]
        assert one(spark, S.array_except_(arr, other)) == [3, 1]
        assert one(spark, S.array_intersect_(arr, other)) == [2]
        assert one(spark, S.array_union_(arr, other)) == [3, 1, 2]
        assert one(spark, S.array_remove_(arr, F.lit(3))) == [1, 2]
        assert one(spark, S.array_max_(arr)) == 3
        assert one(spark, S.array_min_(arr)) == 1
        assert one(spark, S.array_sort_(arr)) == [1, 2, 3, 3]
        assert one(spark, S.array_contain(arr, F.lit(2))) is True
        assert one(spark, S.array_join_(arr.cast("array<string>"), ",")) == "3,1,3,2"

    def test_array_index_and_slice_zero_based(self, spark):
        arr = F.array(*[F.lit(i) for i in (10, 20, 30, 40)])
        assert one(spark, S.array_index(arr, 0)) == 10
        assert one(spark, S.array_index(arr, 3)) == 40
        assert one(spark, S.array_slice(arr, 1, 2)) == [20, 30]
        assert one(spark, S.array_slice(arr, 2, None)) == [30, 40]
        assert one(spark, S.array_slice(arr, None, 1)) == [10, 20]


class TestJson:
    def test_json_get(self, spark):
        j = F.lit('{"a": {"b": 7}, "arr": [1, 2]}')
        assert one(spark, S.json_get(j, "a")) == '{"b":7}'
        assert one(spark, S.json_path(j, ["a", "b"])) == "7"
        assert one(spark, S.json_path(j, ["arr", 1])) == "2"


class TestCasts:
    def test_cast_int_floors(self, spark):
        assert one(spark, S.cast_int(F.lit(1.9))) == 1
        assert one(spark, S.cast_int(F.lit(True))) == 1

    def test_cast_text_null_literal(self, spark):
        assert one(spark, S.cast_text(F.lit(None).cast("int"))) == "NULL"

    def test_cast_bool_accepts_variants(self, spark):
        for txt, expect in [("TRUE", True), ("f", False), ("1", True), ("0", False)]:
            assert one(spark, S.cast_bool(F.lit(txt))) is expect


class TestTernary:
    def test_between_symmetric(self, spark):
        v = F.lit(5)
        assert one(spark, S.between_symmetric(v, F.lit(9), F.lit(1))) is True
        assert one(spark, S.not_between_symmetric(v, F.lit(6), F.lit(9))) is True


class TestDates:
    def test_datetostring_roundtrip(self, spark):
        epoch = 1704067200  # 2024-01-01T00:00:00Z
        assert (
            one(spark, S.datetostring(F.lit(epoch), "yyyy-MM-dd HH:mm:ss"))
            == "2024-01-01 00:00:00"
        )
        assert (
            one(spark, S.stringtodate(F.lit("2024-01-01 00:00:00"), "yyyy-MM-dd HH:mm:ss"))
            == epoch
        )
