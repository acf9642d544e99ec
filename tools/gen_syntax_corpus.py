"""(Re)generate the golden syntax corpus at tests/golden_syntax.json.

The corpus pins SQL → repr(AST) snapshots (and expected-error cases) so
any parser change that shifts an AST shape or error behavior fails
loudly — the same golden parse-corpus pattern the reference uses for
its dialect (SURVEY.md §5), with our own cases.

Run after an INTENTIONAL parser change: python tools/gen_syntax_corpus.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hstream_spark.plans.parser import ParseError, parse  # noqa: E402

OK_CASES = [
    # projection / filter / expressions
    "SELECT * FROM s1;",
    "SELECT s1.* FROM s1;",
    "SELECT a, b AS bee FROM s1 WHERE a > 1 AND b = 'x';",
    "SELECT a + b * c - 2 FROM s1;",
    "SELECT SUM(a) + 1 AS t FROM s1 GROUP BY b;",
    "SELECT a FROM s1 WHERE NOT (a < 0 OR a > 10);",
    "SELECT IFNULL(a, 0), NULLIF(b, '') FROM s1;",
    "SELECT ABS(a), ROUND(b), SIGN(c) FROM s1;",
    "SELECT TO_LOWER(TRIM(name)) FROM s1;",
    "SELECT ARRAY_DISTINCT(xs), ARRAY_JOIN(xs, ','), xs[0] FROM s1;",
    "SELECT arr[1:3], arr[2:], arr[:2] FROM s1;",
    "SELECT {1, 2, 3} AS lits FROM s1;",
    "SELECT a :: FLOAT, CAST(b AS STRING) FROM s1;",
    "SELECT c BETWEEN 1 AND 5, c NOT BETWEEN SYMMETRIC 9 AND 2 FROM s1;",
    "SELECT obj->'k', obj->>'k', obj#>'{a,0}', obj#>>'{a,0}' FROM s1;",
    "SELECT DATETOSTRING(ts, 'yyyy-MM-dd'), STRINGTODATE(d, 'yyyy-MM-dd') FROM s1;",
    "SELECT SPLIT(',', csv), CHUNKSOF(4, txt), TAKE(3, txt), TAKEEND(3, txt) FROM s1;",
    "SELECT a = NULL, NULL = NULL FROM s1;",
    # aggregates / group by / having
    "SELECT k, COUNT(*), SUM(v), MIN(v), MAX(v), AVG(v) FROM s1 GROUP BY k;",
    "SELECT k, TOPK(v, 3), TOPKDISTINCT(v, 3) FROM s1 GROUP BY k;",
    "SELECT k, SUM(v) AS s FROM s1 GROUP BY k HAVING SUM(v) > 10;",
    "SELECT k1, k2, COUNT(*) FROM s1 GROUP BY k1, k2;",
    # windows
    "SELECT k, COUNT(*) FROM TUMBLE(s1, INTERVAL 10 SECOND) GROUP BY k;",
    "SELECT k, COUNT(*) FROM HOP(s1, INTERVAL 10 SECOND, INTERVAL 5 SECOND) GROUP BY k;",
    "SELECT k, COUNT(*) FROM SESSION(s1, INTERVAL 30 SECOND) GROUP BY k;",
    # joins
    "SELECT * FROM s1 JOIN s2 ON s1.k = s2.k WITHIN (INTERVAL 5 MINUTE);",
    "SELECT * FROM s1 LEFT JOIN s2 ON s1.k = s2.k WITHIN (INTERVAL 1 HOUR);",
    "SELECT * FROM s1 FULL OUTER JOIN s2 USING (k) WITHIN (INTERVAL 1 DAY);",
    "SELECT * FROM s1 NATURAL JOIN s2 WITHIN (INTERVAL 5 SECOND);",
    "SELECT * FROM s1 CROSS JOIN s2 WITHIN (INTERVAL 5 SECOND);",
    "SELECT * FROM s1, s2 WHERE s1.k = s2.k;",
    "SELECT * FROM s1, s2, s3;",
    # push / continuous
    "SELECT a FROM s1 EMIT CHANGES;",
    # DDL / DML / control
    "CREATE STREAM s;",
    "CREATE STREAM s (a INTEGER, b STRING, c FLOAT);",
    "CREATE STREAM s WITH (REPLICATE = 3, DURATION = INTERVAL 7 DAY);",
    "CREATE STREAM out AS SELECT a, SUM(b) FROM s1 GROUP BY a;",
    "CREATE VIEW v AS SELECT k, COUNT(*) FROM s1 GROUP BY k;",
    "CREATE VIEW v AS SELECT k, COUNT(*) FROM TUMBLE(s1, INTERVAL 10 "
    "SECOND) GROUP BY k WITH (DURATION = INTERVAL 1 DAY);",
    # comma FROM-lists (implicit cross joins, round 8)
    "SELECT * FROM a, b;",
    "SELECT x, y FROM a, b, c WHERE x = y;",
    "SELECT COUNT(*) AS n FROM a, b GROUP BY x;",
    "CREATE SOURCE CONNECTOR c FROM mysql WITH (host = 'h', port = 3306);",
    "CREATE SINK CONNECTOR c TO postgresql WITH (stream = 's1');",
    "INSERT INTO s (a, b) VALUES (1, 'x');",
    "INSERT INTO s VALUES '{\"a\": 1}';",
    "INSERT INTO s SELECT * FROM s1;",
    "SHOW STREAMS;",
    "SHOW QUERIES;",
    "DROP STREAM s IF EXISTS;",
    "DROP STREAM IF EXISTS s;",
    "DROP CONNECTOR c;",
    "TERMINATE QUERY q1;",
    "PAUSE QUERY q1;",
    "RESUME CONNECTOR c1;",
    "EXPLAIN SELECT a FROM s1;",
    "EXPLAIN CREATE VIEW v AS SELECT a FROM s1;",
]

ERR_CASES = [
    "SELECT;",
    "SELECT * FROM;",
    "SELECT * FROM s1 GROUP BY a + 1;",  # group keys are columns only (AST.hs:653-656)
    "SELECT * FROM s1 ORDER BY a;",  # no ORDER BY in the dialect
    "SELECT * FROM s1 LIMIT 5;",  # no LIMIT
    "CREATE TABLE t (a INTEGER);",  # no tables, only streams
    "DROP DATABASE d;",
    "SHOW TABLES;",
    "SELECT `quoted` FROM s1;",  # no backtick quoting in the dialect
    "INSERT INTO s;",
    "PAUSE STREAM s1;",
]


def main() -> None:
    cases = []
    for sql in OK_CASES:
        cases.append({"sql": sql, "ast": repr(parse(sql))})
    for sql in ERR_CASES:
        try:
            parse(sql)
        except ParseError as exc:
            cases.append({"sql": sql, "error": str(exc)})
        else:
            raise SystemExit(f"expected ParseError for: {sql}")
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden_syntax.json")
    with open(out, "w") as fh:
        json.dump(cases, fh, indent=1)
    print(f"wrote {len(cases)} cases to {out}")


if __name__ == "__main__":
    main()
