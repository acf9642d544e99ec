"""One-off scale-sweep data generator (SCALE.md evidence).

Synthesizes an sfN dataset by replicating a base sf directory K times
with disjoint key ranges — /root/testdata is read-only and the driver's
generator isn't available, so scaling evidence comes from replica
expansion of the driver's own data:

- fact/dim keys shift by `replica * (max_key + 1)` per table, so joins
  keep exactly the base data's fan-out and selectivity per replica;
- document TEXT gets a per-replica token tag on every word (replica 0
  stays verbatim): token/shingle distributions keep their shape but
  replicas share no shingles, so dedup/similarity outputs scale
  LINEARLY instead of every doc acquiring K-1 cross-replica twins
  (which would blow candidate pairs up quadratically and measure a
  semantics change, not engine scaling);
- embeddings rotate cyclically by the replica index: norms and
  coordinate distributions survive, cross-replica cosine decorrelates.

Usage:  python tools/gen_scale_data.py [base_dir out_dir replicas]
Defaults: /root/testdata/sf0.1  <repo>/.scale/sf1  10
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_COPY = ("region", "nation")


def generate(base: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{base}/{t}.parquet')"
        )
    spans = {
        "c": con.execute("SELECT max(c_custkey)+1 FROM customer").fetchone()[0],
        "s": con.execute("SELECT max(s_suppkey)+1 FROM supplier").fetchone()[0],
        "p": con.execute("SELECT max(p_partkey)+1 FROM part").fetchone()[0],
        "o": con.execute("SELECT max(o_orderkey)+1 FROM orders").fetchone()[0],
        "e": con.execute("SELECT max(event_id)+1 FROM events").fetchone()[0],
        "u": con.execute("SELECT max(user_id)+1 FROM events").fetchone()[0],
        "d": con.execute("SELECT max(doc_id)+1 FROM documents").fetchone()[0],
        "v": con.execute("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0],
    }
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({k})) AS r")

    def emit(name: str, select: str) -> None:
        dest = os.path.join(out, f"{name}.parquet")
        con.execute(
            f"COPY ({select}) TO '{dest}' (FORMAT PARQUET, "
            "COMPRESSION SNAPPY)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"  {name}: {n} rows")

    for t in TABLES_COPY:
        emit(t, f"SELECT * FROM {t}")
    emit("customer", f"""
        SELECT c_custkey + r * {spans['c']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer CROSS JOIN reps""")
    emit("supplier", f"""
        SELECT s_suppkey + r * {spans['s']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM supplier CROSS JOIN reps""")
    emit("part", f"""
        SELECT p_partkey + r * {spans['p']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM part CROSS JOIN reps""")
    emit("orders", f"""
        SELECT o_orderkey + r * {spans['o']} AS o_orderkey,
               o_custkey + r * {spans['c']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN reps""")
    emit("lineitem", f"""
        SELECT l_orderkey + r * {spans['o']} AS l_orderkey,
               l_partkey + r * {spans['p']} AS l_partkey,
               l_suppkey + r * {spans['s']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN reps""")
    emit("events", f"""
        SELECT event_id + r * {spans['e']} AS event_id, ts,
               user_id + r * {spans['u']} AS user_id,
               event_type, value, props
        FROM events CROSS JOIN reps""")
    emit("documents", f"""
        SELECT doc_id + r * {spans['d']} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> w || 'q' || CAST(r AS VARCHAR)), ' ')
               END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars
                    ELSE len(array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> w || 'q' || CAST(r AS VARCHAR)), ' '))
               END AS n_chars
        FROM documents CROSS JOIN reps""")
    emit("embeddings", f"""
        SELECT vec_id + r * {spans['v']} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE list_concat(embedding[(r % 64) + 1:],
                                     embedding[:(r % 64)])
               END AS embedding,
               label
        FROM embeddings CROSS JOIN reps""")


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".scale", "sf1"
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(f"generating {k}x replica of {base} -> {out}")
    generate(base, out, k)
    print("done")
