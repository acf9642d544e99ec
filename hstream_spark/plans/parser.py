"""Recursive-descent parser for the HStream SQL dialect.

Grammar transliterated (behaviorally, not mechanically) from the
reference BNFC grammar hstream-sql/etc/SQL-v1.cf. Precedence chain
(loosest→tightest): OR < AND < NOT < comparisons < BETWEEN < json ops
< + - < * < array access < cast(::) < atoms — SQL-v1.cf:177-352.

Unaliased select items are named by their source text with whitespace
stripped, matching the reference's ``trimSpacesPrint`` naming
(AST.hs:350-396): ``SELECT SUM(a) ...`` yields a column ``SUM(a)``.
"""

from __future__ import annotations

import re
from typing import Optional

from hstream_spark.plans import ast as A

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+|\d+)
  | (?P<dqstr>"(?:[^"])*")
  | (?P<sqstr>'(?:[^'])*')
  | (?P<op><>|<=|>=|->>|->|\#>>|\#>|::|[=<>+\-*(),;.{}\[\]:])
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
    """,
    re.VERBOSE | re.DOTALL,
)

KEYWORDS = {
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "AS", "EMIT", "CHANGES",
    "CREATE", "STREAM", "VIEW", "SOURCE", "SINK", "CONNECTOR", "WITH", "INSERT",
    "INTO", "VALUES", "SHOW", "DROP", "TERMINATE", "EXPLAIN", "PAUSE", "RESUME",
    "IF", "NOT", "EXIST", "EXISTS", "AND", "OR", "BETWEEN", "SYMMETRIC", "CAST",
    "NULL", "TRUE", "FALSE", "DATE", "TIME", "TIMESTAMP", "INTERVAL", "JOIN",
    "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "CROSS", "NATURAL", "ON", "USING",
    "WITHIN", "TUMBLE", "HOP", "SESSION", "SLIDING", "TO", "QUERIES", "STREAMS",
    "CONNECTORS", "VIEWS", "QUERY",
}

AGG_FUNCS = {"COUNT", "AVG", "SUM", "MAX", "MIN", "TOPK", "TOPKDISTINCT"}

SCALAR_FUNCS = {
    "SIN", "SINH", "ASIN", "ASINH", "COS", "COSH", "ACOS", "ACOSH", "TAN",
    "TANH", "ATAN", "ATANH", "ABS", "CEIL", "FLOOR", "ROUND", "SIGN", "SQRT",
    "LOG", "LOG2", "LOG10", "EXP", "IS_INT", "IS_FLOAT", "IS_NUM", "IS_BOOL",
    "IS_STR", "IS_ARRAY", "IS_DATE", "IS_TIME", "TO_STR", "TO_LOWER",
    "TO_UPPER", "TRIM", "LEFT_TRIM", "RIGHT_TRIM", "REVERSE", "STRLEN",
    "IFNULL", "NULLIF", "DATETOSTRING", "STRINGTODATE", "SPLIT", "CHUNKSOF",
    "TAKE", "TAKEEND", "DROP", "DROPEND", "ARRAY_CONTAIN", "ARRAY_DISTINCT",
    "ARRAY_EXCEPT", "ARRAY_INTERSECT", "ARRAY_LENGTH", "ARRAY_REMOVE",
    "ARRAY_UNION", "ARRAY_JOIN", "ARRAY_MAX", "ARRAY_MIN", "ARRAY_SORT",
}

DATA_TYPES = {"INTEGER", "FLOAT", "BOOLEAN", "BYTEA", "STRING", "DATE", "TIME",
              "TIMESTAMP", "INTERVAL", "JSONB"}

INTERVAL_UNITS = {"SECOND", "MINUTE", "HOUR", "DAY", "MONTH", "YEAR"}


class ParseError(ValueError):
    pass


class _Tok:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind  # num | str | dqident | op | ident | kw
        self.text = text
        self.pos = pos

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.kind}:{self.text}"


def tokenize(sql: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ParseError(f"lexical error at offset {pos}: {sql[pos:pos+20]!r}")
        if m.lastgroup == "ws":
            pos = m.end()
            continue
        text = m.group()
        if m.lastgroup == "num":
            out.append(_Tok("num", text, pos))
        elif m.lastgroup == "sqstr":
            out.append(_Tok("str", text[1:-1], pos))
        elif m.lastgroup == "dqstr":
            out.append(_Tok("dqident", text[1:-1], pos))
        elif m.lastgroup == "op":
            out.append(_Tok("op", text, pos))
        else:
            upper = text.upper()
            kind = "kw" if (upper in KEYWORDS or upper in AGG_FUNCS
                            or upper in SCALAR_FUNCS or upper in DATA_TYPES
                            or upper in INTERVAL_UNITS) else "ident"
            out.append(_Tok(kind, text, pos))
        pos = m.end()
    return out


class Parser:
    def __init__(self, sql: str):
        self.sql = sql
        self.toks = tokenize(sql)
        self.i = 0

    # -- primitives ---------------------------------------------------------

    def peek(self, ahead: int = 0) -> Optional[_Tok]:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def at_kw(self, *kws: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t is not None and t.kind == "kw" and t.text.upper() in kws

    def at_op(self, *ops: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t is not None and t.kind == "op" and t.text in ops

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input")
        self.i += 1
        return t

    def expect_kw(self, kw: str) -> _Tok:
        t = self.next()
        if t.kind != "kw" or t.text.upper() != kw:
            raise ParseError(f"expected {kw}, got {t.text!r} at offset {t.pos}")
        return t

    def expect_op(self, op: str) -> _Tok:
        t = self.next()
        if t.kind != "op" or t.text != op:
            raise ParseError(f"expected {op!r}, got {t.text!r} at offset {t.pos}")
        return t

    def ident(self) -> str:
        t = self.next()
        if t.kind in ("ident", "dqident"):
            return t.text
        # keywords usable as identifiers when unambiguous (stream names)
        if t.kind == "kw" and t.text.upper() not in {"SELECT", "FROM", "WHERE"}:
            return t.text
        raise ParseError(f"expected identifier, got {t.text!r} at offset {t.pos}")

    def _text_between(self, start_tok: int, end_tok: int) -> str:
        """Source text spanning tokens [start, end) with whitespace removed
        (reference trimSpacesPrint naming)."""
        if start_tok >= end_tok:
            return ""
        lo = self.toks[start_tok].pos
        hi_tok = self.toks[end_tok - 1]
        hi = hi_tok.pos + len(hi_tok.text) + (2 if hi_tok.kind == "str" else 0)
        return re.sub(r"\s+", "", self.sql[lo:hi])

    # -- entry --------------------------------------------------------------

    def parse(self) -> A.Statement:
        stmt = self._statement()
        if self.at_op(";"):
            self.next()
        if self.peek() is not None:
            t = self.peek()
            raise ParseError(f"trailing input at offset {t.pos}: {t.text!r}")
        return stmt

    def _statement(self) -> A.Statement:
        if self.at_kw("SELECT"):
            return self._select()
        if self.at_kw("CREATE"):
            return self._create()
        if self.at_kw("INSERT"):
            return self._insert()
        if self.at_kw("SHOW"):
            self.next()
            t = self.next()
            what = t.text.upper()
            if what == "REPLAY":
                # SHOW REPLAY ERRORS — recovery failures the DDL-replay
                # quarantine swallowed (engine extension; the reference
                # aborts recovery outright instead of quarantining)
                t2 = self.next()
                if t2.text.upper() != "ERRORS":
                    raise ParseError(
                        f"SHOW REPLAY: expected ERRORS, got {t2.text!r}"
                    )
                return A.Show("REPLAY_ERRORS")
            if what not in {"QUERIES", "STREAMS", "CONNECTORS", "VIEWS"}:
                raise ParseError(f"SHOW: unknown object {t.text!r}")
            return A.Show(what)
        if self.at_kw("DROP"):
            self.next()
            what = self.next().text.upper()
            if what not in {"CONNECTOR", "STREAM", "VIEW", "QUERY"}:
                raise ParseError(f"DROP: unknown object {what!r}")
            if_exists = False
            # ANSI prefix form (DROP STREAM IF EXISTS s) accepted as a
            # convenience; the reference dialect is postfix
            # (DROP STREAM s IF EXISTS — SQL-v1.cf:92)
            if self.at_kw("IF"):
                self.next()
                self.expect_kw("EXISTS")
                if_exists = True
            name = self.ident()
            if self.at_kw("IF"):
                self.next()
                self.expect_kw("EXISTS")
                if_exists = True
            return A.Drop(what, name, if_exists)
        if self.at_kw("TERMINATE"):
            self.next()
            self.expect_kw("QUERY")
            return A.Terminate(self.ident())
        if self.at_kw("EXPLAIN"):
            self.next()
            inner = self._statement()
            if not isinstance(inner, (A.Select, A.CreateStreamAs, A.CreateView)):
                raise ParseError("EXPLAIN requires SELECT or CREATE ... AS SELECT")
            return A.Explain(inner)
        if self.at_kw("PAUSE") or self.at_kw("RESUME"):
            verb = self.next().text.upper()
            what = self.next().text.upper()
            if what not in {"CONNECTOR", "QUERY"}:
                raise ParseError(f"{verb}: unknown object {what!r}")
            name = self.ident()
            return A.Pause(what, name) if verb == "PAUSE" else A.Resume(what, name)
        t = self.peek()
        raise ParseError(f"unexpected token {t.text!r} at offset {t.pos}")

    # -- CREATE -------------------------------------------------------------

    def _options(self) -> dict[str, object]:
        self.expect_kw("WITH")
        self.expect_op("(")
        opts: dict[str, object] = {}
        while not self.at_op(")"):
            key = self.ident()
            self.expect_op("=")
            if self.at_kw("INTERVAL"):
                opts[key.upper()] = self._interval()
            else:
                val = self._expr()
                opts[key.upper()] = val.value if isinstance(val, A.Lit) else val
            if self.at_op(","):
                self.next()
        self.expect_op(")")
        return opts

    def _create(self) -> A.Statement:
        self.next()  # CREATE
        if self.at_kw("VIEW"):
            self.next()
            name = self.ident()
            self.expect_kw("AS")
            sel = self._select()
            # trailing WITH (…) mirrors CREATE STREAM AS SELECT; the
            # only recognized view option is DURATION (state retention)
            opts = self._options() if self.at_kw("WITH") else {}
            return A.CreateView(name, sel, opts)
        if self.at_kw("SOURCE") or self.at_kw("SINK"):
            kind = self.next().text.upper()
            self.expect_kw("CONNECTOR")
            name = self.ident()
            self.expect_kw("FROM" if kind == "SOURCE" else "TO")
            target = self.ident()
            if_not = False
            if self.at_kw("IF"):
                self.next()
                self.expect_kw("NOT")
                self.expect_kw("EXIST")
                if_not = True
            opts = self._options()
            return A.CreateConnector(kind, name, target, if_not, opts)
        self.expect_kw("STREAM")
        name = self.ident()
        if self.at_kw("AS"):
            self.next()
            sel = self._select()
            opts = self._options() if self.at_kw("WITH") else {}
            return A.CreateStreamAs(name, sel, opts)
        if self.at_op("("):
            self.next()
            cols = []
            while not self.at_op(")"):
                cname = self.ident()
                cols.append(A.SchemaColumn(cname, self._data_type()))
                if self.at_op(","):
                    self.next()
            self.expect_op(")")
            opts = self._options() if self.at_kw("WITH") else {}
            return A.CreateStream(name, columns=cols, options=opts)
        opts = self._options() if self.at_kw("WITH") else {}
        return A.CreateStream(name, options=opts)

    def _data_type(self) -> str:
        t = self.next()
        dt = t.text.upper()
        if dt not in DATA_TYPES:
            raise ParseError(f"unknown type {t.text!r}")
        while self.at_op("[") and self.at_op("]", ahead=1):
            self.next()
            self.next()
            dt = dt + "[]"
        return dt

    # -- INSERT -------------------------------------------------------------

    def _insert(self) -> A.Insert:
        self.next()  # INSERT
        self.expect_kw("INTO")
        stream = self.ident()
        if self.at_kw("SELECT"):
            return A.Insert(stream, select=self._select())
        if self.at_op("("):
            self.next()
            cols = []
            while not self.at_op(")"):
                cols.append(self.ident())
                if self.at_op(","):
                    self.next()
            self.expect_op(")")
            self.expect_kw("VALUES")
            self.expect_op("(")
            vals = []
            while not self.at_op(")"):
                vals.append(self._expr())
                if self.at_op(","):
                    self.next()
            self.expect_op(")")
            return A.Insert(stream, columns=cols, values=vals)
        self.expect_kw("VALUES")
        return A.Insert(stream, raw=self._expr())

    # -- SELECT -------------------------------------------------------------

    def _select(self) -> A.Select:
        self.expect_kw("SELECT")
        items = [self._select_item()]
        while self.at_op(","):
            self.next()
            items.append(self._select_item())
        from_ = None
        if self.at_kw("FROM"):
            self.next()
            from_ = self._table_ref()
            # comma-list folds to cross joins (V2 grammar,
            # Planner.hs:331-333); WHERE supplies the join predicates
            while self.at_op(","):
                self.next()
                right = self._table_ref()
                from_ = A.JoinRef(from_, right, "CROSS", "CROSS")
        where = None
        if self.at_kw("WHERE"):
            self.next()
            where = self._expr()
        group_by: list[A.ColRef] = []
        if self.at_kw("GROUP"):
            self.next()
            self.expect_kw("BY")
            group_by.append(self._col_name())
            while self.at_op(","):
                self.next()
                group_by.append(self._col_name())
        having = None
        if self.at_kw("HAVING"):
            self.next()
            having = self._expr()
        emit = False
        if self.at_kw("EMIT"):
            self.next()
            self.expect_kw("CHANGES")
            emit = True
        return A.Select(items, from_, where, group_by, having, emit)

    def _col_name(self) -> A.ColRef:
        first = self.ident()
        if self.at_op("."):
            self.next()
            return A.ColRef(self.ident(), stream=first)
        return A.ColRef(first)

    def _select_item(self) -> A.SelectItem:
        if self.at_op("*"):
            self.next()
            return A.SelectItem(None, wildcard=True, text="*")
        # qualified wildcard s.*
        if (self.peek() and self.peek().kind in ("ident", "dqident")
                and self.at_op(".", ahead=1) and self.at_op("*", ahead=2)):
            stream = self.ident()
            self.next()
            self.next()
            return A.SelectItem(None, wildcard=True, wildcard_stream=stream,
                                text=f"{stream}.*")
        start = self.i
        expr = self._expr()
        text = self._text_between(start, self.i)
        alias = None
        if self.at_kw("AS"):
            self.next()
            alias = self.ident()
        return A.SelectItem(expr, alias=alias, text=text)

    # -- FROM / joins -------------------------------------------------------

    def _table_ref(self) -> A.TableRef:
        left = self._table_ref_primary()
        while True:
            join_type = None
            cond_kind = None
            if self.at_kw("CROSS"):
                self.next()
                self.expect_kw("JOIN")
                join_type, cond_kind = "CROSS", "CROSS"
            elif self.at_kw("NATURAL"):
                self.next()
                join_type = self._join_type()
                self.expect_kw("JOIN")
                cond_kind = "NATURAL"
            elif self.at_kw("JOIN", "INNER", "LEFT", "RIGHT", "FULL"):
                join_type = self._join_type()
                self.expect_kw("JOIN")
                cond_kind = None  # decided below (ON / USING)
            else:
                return left
            right = self._table_ref_primary()
            on = None
            using: list[str] = []
            if cond_kind is None:
                if self.at_kw("ON"):
                    self.next()
                    on = self._expr()
                    cond_kind = "ON"
                elif self.at_kw("USING"):
                    self.next()
                    self.expect_op("(")
                    while not self.at_op(")"):
                        using.append(self.ident())
                        if self.at_op(","):
                            self.next()
                    self.expect_op(")")
                    cond_kind = "USING"
                else:
                    raise ParseError("JOIN requires ON or USING (or NATURAL/CROSS)")
            within = None
            if self.at_kw("WITHIN"):
                self.next()
                self.expect_op("(")
                within = self._interval()
                self.expect_op(")")
            left = A.JoinRef(left, right, join_type, cond_kind, on, using, within)

    def _join_type(self) -> str:
        if self.at_kw("INNER"):
            self.next()
            return "INNER"
        for kw in ("LEFT", "RIGHT", "FULL"):
            if self.at_kw(kw):
                self.next()
                if self.at_kw("OUTER"):
                    self.next()
                return kw
        return "INNER"  # bare JOIN

    def _table_ref_primary(self) -> A.TableRef:
        ref: A.TableRef
        if self.at_kw("TUMBLE", "HOP", "SESSION", "SLIDING"):
            kind = self.next().text.upper()
            self.expect_op("(")
            inner = self._table_ref_primary()
            self.expect_op(",")
            size = self._interval()
            advance = None
            if kind == "HOP":
                self.expect_op(",")
                advance = self._interval()
            self.expect_op(")")
            ref = A.WindowedRef(inner, kind, size, advance)
        elif self.at_op("("):
            self.next()
            sel = self._select()
            self.expect_op(")")
            ref = A.SubqueryRef(sel)
        else:
            ref = A.StreamRef(self.ident())
        if self.at_kw("AS"):
            self.next()
            alias = self.ident()
            if isinstance(ref, (A.StreamRef, A.SubqueryRef)):
                ref.alias = alias
            else:
                ref.inner = ref.inner  # windowed: alias applies to inner stream
        return ref

    def _interval(self) -> A.Interval:
        self.expect_kw("INTERVAL")
        t = self.next()
        if t.kind != "num":
            raise ParseError(f"INTERVAL expects an integer, got {t.text!r}")
        unit = self.next().text.upper()
        if unit not in INTERVAL_UNITS:
            raise ParseError(f"unknown interval unit {unit!r}")
        return A.Interval(int(t.text), unit)

    # -- expressions (precedence per SQL-v1.cf:177-352) ---------------------

    def _expr(self) -> A.Expr:
        # array literals are handled at atom level (superset of the
        # reference grammar, which puts ExprArr at the loosest tier)
        return self._or_expr()

    def _array_literal(self) -> A.Arr:
        self.expect_op("{")
        items = []
        while not self.at_op("}"):
            items.append(self._expr())
            if self.at_op(","):
                self.next()
        self.expect_op("}")
        return A.Arr(items)

    def _or_expr(self) -> A.Expr:
        left = self._and_expr()
        while self.at_kw("OR"):
            self.next()
            left = A.BinOp("OR", left, self._and_expr())
        return left

    def _and_expr(self) -> A.Expr:
        left = self._not_expr()
        while self.at_kw("AND"):
            self.next()
            left = A.BinOp("AND", left, self._not_expr())
        return left

    def _not_expr(self) -> A.Expr:
        if self.at_kw("NOT") and not self.at_kw("BETWEEN", ahead=1):
            self.next()
            return A.UnOp("NOT", self._not_expr())
        return self._cmp_expr()

    def _cmp_expr(self) -> A.Expr:
        left = self._between_expr()
        while self.at_op("=", "<>", "<", ">", "<=", ">="):
            op = self.next().text
            left = A.BinOp(op, left, self._between_expr())
        return left

    def _between_expr(self) -> A.Expr:
        operand = self._json_expr()
        negated = False
        if self.at_kw("NOT") and self.at_kw("BETWEEN", ahead=1):
            self.next()
            negated = True
        if self.at_kw("BETWEEN"):
            self.next()
            symmetric = False
            if self.at_kw("SYMMETRIC"):
                self.next()
                symmetric = True
            low = self._json_expr()
            self.expect_kw("AND")
            high = self._json_expr()
            return A.Between(operand, low, high, negated, symmetric)
        return operand

    def _json_expr(self) -> A.Expr:
        left = self._add_expr()
        while self.at_op("->", "->>", "#>", "#>>"):
            op = self.next().text
            left = A.JsonOp(op, left, self._add_expr())
        return left

    def _add_expr(self) -> A.Expr:
        left = self._mul_expr()
        while self.at_op("+", "-"):
            op = self.next().text
            left = A.BinOp(op, left, self._mul_expr())
        return left

    def _mul_expr(self) -> A.Expr:
        left = self._access_expr()
        while self.at_op("*"):
            self.next()
            left = A.BinOp("*", left, self._access_expr())
        return left

    def _access_expr(self) -> A.Expr:
        operand = self._cast_expr()
        while self.at_op("["):
            self.next()
            lo = hi = None
            is_slice = False
            if self.at_op(":"):
                self.next()
                is_slice = True
                hi = int(self.next().text)
            else:
                lo = int(self.next().text)
                if self.at_op(":"):
                    self.next()
                    is_slice = True
                    if not self.at_op("]"):
                        hi = int(self.next().text)
            self.expect_op("]")
            if is_slice:
                operand = A.ArrayAccess(operand, lo=lo, hi=hi, is_slice=True)
            else:
                operand = A.ArrayAccess(operand, index=lo)
        return operand

    def _cast_expr(self) -> A.Expr:
        operand = self._atom()
        while self.at_op("::"):
            self.next()
            operand = A.Cast(operand, self._data_type())
        return operand

    def _atom(self) -> A.Expr:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of expression")
        if self.at_op("("):
            self.next()
            inner = self._expr()
            self.expect_op(")")
            return inner
        if self.at_op("{"):
            return self._array_literal()
        if self.at_op("+", "-"):
            sign = self.next().text
            num = self.next()
            if num.kind != "num":
                raise ParseError(f"expected number after {sign!r}")
            return self._num_lit(num.text, negative=(sign == "-"))
        if t.kind == "num":
            self.next()
            return self._num_lit(t.text)
        if t.kind == "str":
            self.next()
            return A.Lit(t.text, "string")
        if t.kind == "kw":
            kw = t.text.upper()
            if kw == "NULL":
                self.next()
                return A.Lit(None, "null")
            if kw in ("TRUE", "FALSE"):
                self.next()
                return A.Lit(kw == "TRUE", "bool")
            if kw in ("DATE", "TIME", "TIMESTAMP") and self.peek(1) and self.peek(1).kind == "str":
                self.next()
                lit = self.next()
                return A.Lit(lit.text, kw.lower())
            if kw == "INTERVAL":
                return self._interval()
            if kw == "CAST":
                self.next()
                self.expect_op("(")
                inner = self._expr()
                self.expect_kw("AS")
                dt = self._data_type()
                self.expect_op(")")
                return A.Cast(inner, dt)
            if kw == "COUNT" and self.at_op("(", ahead=1) and self.at_op("*", ahead=2):
                self.next(); self.next(); self.next()
                self.expect_op(")")
                return A.AggFunc("COUNT_ALL", [])
            if kw in AGG_FUNCS and self.at_op("(", ahead=1):
                self.next()
                args = self._call_args()
                return A.AggFunc(kw, args)
            if kw in SCALAR_FUNCS and self.at_op("(", ahead=1):
                self.next()
                args = self._call_args()
                return A.Func(kw, args)
        # column reference (possibly stream-qualified)
        if t.kind in ("ident", "dqident") or t.kind == "kw":
            name = self.ident()
            if self.at_op(".") and not self.at_op("*", ahead=1):
                self.next()
                return A.ColRef(self.ident(), stream=name)
            return A.ColRef(name)
        raise ParseError(f"unexpected token {t.text!r} at offset {t.pos}")

    def _call_args(self) -> list[A.Expr]:
        self.expect_op("(")
        args = []
        while not self.at_op(")"):
            args.append(self._expr())
            if self.at_op(","):
                self.next()
        self.expect_op(")")
        return args

    def _num_lit(self, text: str, negative: bool = False) -> A.Lit:
        if "." in text or "e" in text or "E" in text:
            v = float(text)
            return A.Lit(-v if negative else v, "float")
        v = int(text)
        return A.Lit(-v if negative else v, "int")


def parse(sql: str) -> A.Statement:
    """Parse one HStream SQL statement."""
    return Parser(sql).parse()
