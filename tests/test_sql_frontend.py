"""Parser + compiler tests for the HStream SQL dialect — golden-style
cases modeled on the reference syntax corpus
(hstream-sql/etc/syntax-test-cases.yaml) and e2e fixtures
(hstream/test/HStream/RunSQLSpec.hs)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hstream_spark.plans import ast as A
from hstream_spark.plans.compiler import CompileError, compile_select
from hstream_spark.plans.parser import ParseError, parse


class TestParser:
    def test_select_star(self):
        for sql in ["select * from s;", "select*from s;", "SELECT * FROM s"]:
            stmt = parse(sql)
            assert isinstance(stmt, A.Select)
            assert stmt.items[0].wildcard
            assert isinstance(stmt.from_, A.StreamRef) and stmt.from_.name == "s"
            assert not stmt.emit_changes

    def test_emit_changes(self):
        stmt = parse("select temperature, humidity from readings emit changes;")
        assert stmt.emit_changes
        assert [it.expr.name for it in stmt.items] == ["temperature", "humidity"]

    def test_json_arrow_spacing(self):
        for sql in [
            "select c->>'season_id' from production_changes EMIT CHANGES;",
            "select c ->> 'season_id' from production_changes EMIT CHANGES;",
        ]:
            stmt = parse(sql)
            item = stmt.items[0]
            assert isinstance(item.expr, A.JsonOp) and item.expr.op == "->>"
            assert item.text == "c->>'season_id'"

    def test_dash_is_subtraction(self):
        stmt = parse("select a-b from s emit changes;")
        e = stmt.items[0].expr
        assert isinstance(e, A.BinOp) and e.op == "-"
        assert stmt.items[0].text == "a-b"

    def test_unaliased_item_named_by_text(self):
        stmt = parse("SELECT SUM(a), b FROM s GROUP BY b;")
        assert stmt.items[0].text == "SUM(a)"
        assert isinstance(stmt.items[0].expr, A.AggFunc)
        assert stmt.group_by[0].name == "b"

    def test_windowed_from(self):
        stmt = parse(
            "SELECT k, SUM(v) FROM TUMBLE(events, INTERVAL 5 SECOND) GROUP BY k;"
        )
        w = stmt.from_
        assert isinstance(w, A.WindowedRef) and w.window_kind == "TUMBLE"
        assert w.size == A.Interval(5, "SECOND")

    def test_hop_session(self):
        w = parse("SELECT * FROM HOP(s, INTERVAL 10 SECOND, INTERVAL 5 SECOND);").from_
        assert w.window_kind == "HOP" and w.advance == A.Interval(5, "SECOND")
        w = parse("SELECT * FROM SESSION(s, INTERVAL 30 SECOND);").from_
        assert w.window_kind == "SESSION"

    def test_join_within(self):
        stmt = parse(
            "SELECT * FROM a LEFT JOIN b ON a.x = b.y WITHIN (INTERVAL 1 MINUTE);"
        )
        j = stmt.from_
        assert isinstance(j, A.JoinRef)
        assert j.join_type == "LEFT" and j.cond_kind == "ON"
        assert j.within.seconds == 60

    def test_join_using_and_natural(self):
        j = parse("SELECT * FROM a JOIN b USING (k) WITHIN (INTERVAL 5 SECOND);").from_
        assert j.cond_kind == "USING" and j.using == ["k"]
        j = parse("SELECT * FROM a NATURAL JOIN b WITHIN (INTERVAL 5 SECOND);").from_
        assert j.cond_kind == "NATURAL"

    def test_create_stream(self):
        stmt = parse("CREATE STREAM s WITH (REPLICATE = 3);")
        assert isinstance(stmt, A.CreateStream) and stmt.options["REPLICATE"] == 3
        stmt = parse("CREATE STREAM s2 (a INTEGER, b STRING, c FLOAT[]);")
        assert [c.data_type for c in stmt.columns] == ["INTEGER", "STRING", "FLOAT[]"]

    def test_create_stream_as(self):
        stmt = parse("CREATE STREAM out AS SELECT a, 1 AS b FROM source1;")
        assert isinstance(stmt, A.CreateStreamAs) and stmt.name == "out"
        assert stmt.select.items[1].alias == "b"

    def test_create_view(self):
        stmt = parse("CREATE VIEW v AS SELECT SUM(a), b FROM source2 GROUP BY b;")
        assert isinstance(stmt, A.CreateView)

    def test_insert_forms(self):
        stmt = parse("INSERT INTO s (a, b) VALUES (1, 'x');")
        assert stmt.columns == ["a", "b"]
        assert [v.value for v in stmt.values] == [1, "x"]
        stmt = parse("insert into s values CAST('{\"x\": 1}' AS JSONB);")
        assert isinstance(stmt.raw, A.Cast)
        stmt = parse("INSERT INTO t SELECT * FROM s;")
        assert stmt.select is not None

    def test_control_statements(self):
        assert parse("SHOW STREAMS;") == A.Show("STREAMS")
        assert parse("DROP VIEW v IF EXISTS;") == A.Drop("VIEW", "v", True)
        assert parse("TERMINATE QUERY q1;") == A.Terminate("q1")
        assert parse("PAUSE CONNECTOR c1;") == A.Pause("CONNECTOR", "c1")
        assert parse("RESUME QUERY q2;") == A.Resume("QUERY", "q2")
        ex = parse("EXPLAIN SELECT * FROM s;")
        assert isinstance(ex, A.Explain)

    def test_between_and_cast(self):
        stmt = parse("SELECT a FROM s WHERE a BETWEEN SYMMETRIC 5 AND 1;")
        assert isinstance(stmt.where, A.Between) and stmt.where.symmetric
        stmt = parse("SELECT a :: INTEGER FROM s;")
        assert isinstance(stmt.items[0].expr, A.Cast)

    def test_array_literal_and_access(self):
        stmt = parse("SELECT {1, 2, 3}[0], arr[1:2] FROM s;")
        first = stmt.items[0].expr
        assert isinstance(first, A.ArrayAccess) and first.index == 0
        second = stmt.items[1].expr
        assert second.is_slice and (second.lo, second.hi) == (1, 2)

    def test_parse_errors(self):
        with pytest.raises(ParseError):
            parse("select * from s")  # missing ; is ok... trailing handled
            parse("anyhow;")
        with pytest.raises(ParseError):
            parse("anyhow")
        with pytest.raises(ParseError):
            parse("SELECT * FROM a JOIN b;")  # missing ON/USING


@pytest.fixture(scope="module")
def streams(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(s):
        return base + datetime.timedelta(seconds=s)

    pairs = spark.createDataFrame(
        [(1, 2, ts(0)), (2, 2, ts(1)), (3, 2, ts(2)), (4, 3, ts(3))],
        "a long, b long, _ts timestamp",
    )
    readings = spark.createDataFrame(
        [(22, 80, ts(0)), (15, 10, ts(1))],
        "temperature long, humidity long, _ts timestamp",
    )
    clicks = spark.createDataFrame(
        [(1, "home", ts(0)), (2, "cart", ts(4)), (1, "cart", ts(100))],
        "cid long, page string, _ts timestamp",
    )
    orders_s = spark.createDataFrame(
        [(10, 1, 99, ts(2)), (11, 2, 50, ts(5)), (12, 9, 11, ts(6))],
        "oid long, cid long, amt long, _ts timestamp",
    )
    tbl = {"pairs": pairs, "readings": readings, "clicks": clicks, "orders_s": orders_s}
    return lambda name: tbl[name]


class TestCompiler:
    def run(self, sql, streams):
        return compile_select(parse(sql), streams)

    def test_select_star(self, spark, streams):
        rows = self.run("SELECT * FROM readings;", streams).collect()
        assert len(rows) == 2 and rows[0]["temperature"] == 22

    def test_filter_project(self, spark, streams):
        rows = self.run(
            "SELECT temperature FROM readings WHERE humidity > 50;", streams
        ).collect()
        assert [r["temperature"] for r in rows] == [22]

    def test_group_by_sum_named_by_text(self, spark, streams):
        df = self.run("SELECT SUM(a), b FROM pairs GROUP BY b;", streams)
        assert df.columns == ["SUM(a)", "b"]
        got = {r["b"]: r["SUM(a)"] for r in df.collect()}
        assert got == {2: 6, 3: 4}

    def test_agg_in_expression(self, spark, streams):
        df = self.run("SELECT SUM(a) + COUNT(*) AS x, b FROM pairs GROUP BY b;", streams)
        got = {r["b"]: r["x"] for r in df.collect()}
        assert got == {2: 9, 3: 5}

    def test_from_subquery(self, spark, streams):
        # SQL-v2.cf:126 TableRefSubquery — derived table in FROM
        df = self.run(
            "SELECT b, SUM(a) AS s FROM "
            "(SELECT a, b FROM pairs WHERE a > 1) GROUP BY b;",
            streams,
        )
        got = {r["b"]: r["s"] for r in df.collect()}
        assert got == {2: 5, 3: 4}

    def test_from_subquery_aliased(self, spark, streams):
        df = self.run(
            "SELECT x.b, COUNT(*) AS n FROM "
            "(SELECT * FROM pairs WHERE b = 2) AS x GROUP BY x.b;",
            streams,
        )
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["n"] == 3

    def test_having(self, spark, streams):
        df = self.run(
            "SELECT b, COUNT(*) AS n FROM pairs GROUP BY b HAVING COUNT(*) > 1;",
            streams,
        )
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["b"] == 2 and rows[0]["n"] == 3

    def test_tumble_window(self, spark, streams):
        df = self.run(
            "SELECT b, SUM(a) AS s FROM TUMBLE(pairs, INTERVAL 2 SECOND) GROUP BY b;",
            streams,
        )
        assert "window_start" in df.columns and "window_end" in df.columns
        got = {(r["window_start"].second, r["b"]): r["s"] for r in df.collect()}
        assert got == {(0, 2): 3, (2, 2): 3, (2, 3): 4}

    def test_interval_join(self, spark, streams):
        df = self.run(
            "SELECT oid, page FROM orders_s JOIN clicks ON orders_s.cid = clicks.cid "
            "WITHIN (INTERVAL 10 SECOND);",
            streams,
        )
        got = sorted((r["oid"], r["page"]) for r in df.collect())
        # oid 10 (cid 1, t=2) ↔ click home@0 within 10s; cart@100 not.
        # oid 11 (cid 2, t=5) ↔ cart@4. oid 12 cid 9 no match.
        assert got == [(10, "home"), (11, "cart")]

    def test_left_join_within(self, spark, streams):
        df = self.run(
            "SELECT oid, page FROM orders_s LEFT JOIN clicks ON orders_s.cid = clicks.cid "
            "WITHIN (INTERVAL 10 SECOND);",
            streams,
        )
        got = sorted((r["oid"], r["page"]) for r in df.collect())
        assert (12, None) in got

    def test_session_window(self, spark, streams):
        df = self.run(
            "SELECT cid, COUNT(*) AS n FROM SESSION(clicks, INTERVAL 30 SECOND) GROUP BY cid;",
            streams,
        )
        got = sorted((r["cid"], r["n"]) for r in df.collect())
        # cid 1: clicks at t=0 and t=100 → two sessions; cid 2: one.
        assert got == [(1, 1), (1, 1), (2, 1)]

    def test_scalar_funcs_in_sql(self, spark, streams):
        df = self.run(
            "SELECT TO_UPPER(page) AS p, STRLEN(page) AS n FROM clicks;", streams
        )
        rows = {(r["p"], r["n"]) for r in df.collect()}
        assert ("HOME", 4) in rows and ("CART", 4) in rows

    def test_null_safe_eq_in_where(self, spark, streams):
        df = self.run("SELECT oid FROM orders_s WHERE NULLIF(amt, 11) = NULL;", streams)
        assert [r["oid"] for r in df.collect()] == [12]

    def test_explain_does_not_execute(self, spark, streams):
        from hstream_spark.plans.compiler import explain

        text = explain(parse("SELECT SUM(a), b FROM pairs GROUP BY b;"), streams)
        assert "Aggregate" in text or "HashAggregate" in text


class TestMultiJoin:
    def test_three_stream_interval_join(self, spark, streams):
        """V2 multi-join: three streams chained with ON + WITHIN; the
        merged event time (max of sides) keeps the second join's
        interval unambiguous (Stream.hs:228-312 ts-merge)."""
        rows = compile_select(
            parse(
                "SELECT clicks.page AS page, orders_s.amt AS amt, pairs.a AS a FROM clicks "
                "JOIN orders_s ON clicks.cid = orders_s.cid WITHIN (INTERVAL 10 SECOND) "
                "JOIN pairs ON pairs.b = orders_s.cid WITHIN (INTERVAL 10 SECOND);"
            ),
            streams,
        ).collect()
        got = sorted((r["page"], r["amt"], r["a"]) for r in rows)
        # clicks(2,'cart',t4) x orders(11,cid2,t5) within 10s; pairs b=2 → a∈{1,2,3}
        assert got == [("cart", 50, 1), ("cart", 50, 2), ("cart", 50, 3)]
