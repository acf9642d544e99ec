"""Unit tests for the unrolled pointer-jumping oracle generator
(`queries._components_sql`) — pure DuckDB, no SparkSession.

The four components-based catalog oracles replay the engine's
connected-components through this SQL; its two load-bearing properties
are (1) the labels equal the true min-id-per-component for graphs far
deeper than one round, and (2) the convergence guard EMPTIES comp
(loud row-count mismatch downstream) rather than shipping a wrong
label when the round budget is too small."""

import duckdb

from hstream_spark.queries import _components_sql


def _run(edges_pairs, rounds):
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in edges_pairs)
    sql = f"""
WITH
pr(id_a, id_b) AS (VALUES {vals}),
edges AS (SELECT id_a AS a, id_b AS b FROM pr UNION SELECT id_b, id_a FROM pr),
{_components_sql(rounds=rounds)}
SELECT doc_id, component FROM comp ORDER BY doc_id
"""
    return con.execute(sql).fetchall()


def test_path_graph_converges_and_labels_min():
    # a 40-node path: diameter 39, far beyond one propagation round —
    # pointer jumping must still land every node on label 0
    edges = [(i, i + 1) for i in range(39)]
    rows = _run(edges, rounds=17)
    assert len(rows) == 40
    assert all(c == 0 for _, c in rows)


def test_multiple_components_keep_distinct_minima():
    edges = [(5, 9), (9, 7), (20, 21), (33, 31), (31, 32)]
    rows = dict(_run(edges, rounds=17))
    assert rows == {5: 5, 7: 5, 9: 5, 20: 20, 21: 20, 31: 31, 32: 31, 33: 31}


def test_convergence_guard_empties_on_round_starvation():
    # rounds=1 cannot converge a 40-node path — the guard must yield
    # ZERO comp rows (downstream row-count gate fails loudly) instead
    # of shipping partial labels
    edges = [(i, i + 1) for i in range(39)]
    assert _run(edges, rounds=1) == []


def test_rounds_scale_log_not_linear():
    # 12 rounds suffice for a 1000-node path (diameter 999): the
    # label-of-label term doubles label reach per round
    edges = [(i, i + 1) for i in range(999)]
    rows = _run(edges, rounds=12)
    assert len(rows) == 1000
    assert all(c == 0 for _, c in rows)
