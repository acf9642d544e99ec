"""AST → DataFrame compiler.

Assembles plans in the reference's fixed decouple order — Scan →
Filter(WHERE) → Affiliate → Reduce(GROUP BY [+window]) →
Filter(HAVING) → Project (hstream-sql/src/HStream/SQL/Planner.hs:
338-387) — then lets Catalyst optimize (predicate pushdown, column
pruning, join strategy), which the reference engine has no analog of.

Aggregates nested inside expressions (``SUM(a) + 1``, HAVING
``COUNT(*) > 2``) are hoisted: each AggFunc node is computed once under
a hidden alias in the Reduce node and substituted back by identity —
mirroring the reference's duplicate-aggregate elimination
(Planner.hs:352-367).

Windowed queries expose ``window_start``/``window_end`` columns, the
batch rendering of the reference's windowed sink key
(Codegen/V1.hs:420-456).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hstream_spark.functions import aggregates as AGG
from hstream_spark.functions import scalar as S
from hstream_spark.operators import joins as J
from hstream_spark.plans import ast as A

Resolver = Callable[[str], DataFrame]

EVENT_TIME_COL = "_ts"  # implicit event-time column (reference: append time)


class CompileError(ValueError):
    pass


# ---------------------------------------------------------------------------
# expression compilation
# ---------------------------------------------------------------------------

_BIN = {
    "OR": lambda l, r: l | r,
    "AND": lambda l, r: l & r,
    "=": S.eq,
    "<>": S.neq,
    "<": lambda l, r: l < r,
    ">": lambda l, r: l > r,
    "<=": lambda l, r: l <= r,
    ">=": lambda l, r: l >= r,
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
}

_FUNCS_1 = {
    "SIN": S.sin, "SINH": S.sinh, "ASIN": S.asin, "ASINH": S.asinh,
    "COS": S.cos, "COSH": S.cosh, "ACOS": S.acos, "ACOSH": S.acosh,
    "TAN": S.tan, "TANH": S.tanh, "ATAN": S.atan, "ATANH": S.atanh,
    "ABS": S.abs_, "CEIL": S.ceil, "FLOOR": S.floor, "ROUND": S.round_,
    "SIGN": S.sign, "SQRT": S.sqrt, "LOG": S.log_, "LOG2": S.log2,
    "LOG10": S.log10, "EXP": S.exp, "TO_STR": S.to_str,
    "TO_LOWER": S.to_lower, "TO_UPPER": S.to_upper, "TRIM": S.trim,
    "LEFT_TRIM": S.left_trim, "RIGHT_TRIM": S.right_trim,
    "REVERSE": S.reverse_, "STRLEN": S.strlen,
    "ARRAY_DISTINCT": S.array_distinct_, "ARRAY_LENGTH": S.array_length,
    "ARRAY_MAX": S.array_max_, "ARRAY_MIN": S.array_min_,
    "ARRAY_SORT": S.array_sort_,
}

_FUNCS_2 = {
    "IFNULL": S.ifnull, "NULLIF": S.nullif,
    "ARRAY_CONTAIN": S.array_contain, "ARRAY_EXCEPT": S.array_except_,
    "ARRAY_INTERSECT": S.array_intersect_, "ARRAY_REMOVE": S.array_remove_,
    "ARRAY_UNION": S.array_union_,
}


def _lit(node: A.Lit) -> Column:
    if node.kind == "null":
        return F.lit(None)
    if node.kind == "date":
        return F.lit(node.value).cast("date")
    if node.kind == "timestamp":
        return F.lit(node.value).cast("timestamp")
    if node.kind == "time":
        return F.lit(node.value).cast("time")  # Spark 4.1 native TimeType
    return F.lit(node.value)


def _require_int_lit(node: A.Expr, what: str) -> int:
    if isinstance(node, A.Lit) and node.kind == "int":
        return int(node.value)
    raise CompileError(f"{what} expects an integer literal")


def _require_topk_k(node: A.Expr, what: str) -> int:
    """TOPK/TOPKDISTINCT k: int literal ≥ 1, rejected at COMPILE time —
    a negative k otherwise defers to a per-row slice error at runtime
    (batch) or silently empty arrays (a capped stateful partial)."""
    k = _require_int_lit(node, what)
    if k < 1:
        raise CompileError(f"{what} expects k >= 1, got {k}")
    return k


def _require_str_lit(node: A.Expr, what: str) -> str:
    if isinstance(node, A.Lit) and node.kind == "string":
        return str(node.value)
    raise CompileError(f"{what} expects a string literal")


def compile_expr(node: A.Expr, agg_subst: Optional[dict[int, str]] = None) -> Column:
    """Compile an expression AST to a Column. ``agg_subst`` maps
    id(AggFunc node) → hidden column name (post-aggregation contexts)."""
    if agg_subst is not None and isinstance(node, A.AggFunc):
        return F.col(agg_subst[id(node)])
    if isinstance(node, A.Lit):
        return _lit(node)
    if isinstance(node, A.Interval):
        return F.lit(node.seconds)
    if isinstance(node, A.ColRef):
        return F.col(f"{node.stream}.{node.name}" if node.stream else node.name)
    if isinstance(node, A.Arr):
        return F.array(*[compile_expr(e, agg_subst) for e in node.items])
    if isinstance(node, A.BinOp):
        return _BIN[node.op](
            compile_expr(node.left, agg_subst), compile_expr(node.right, agg_subst)
        )
    if isinstance(node, A.UnOp):
        if node.op == "NOT":
            return ~compile_expr(node.operand, agg_subst)
        raise CompileError(f"unknown unary op {node.op}")
    if isinstance(node, A.Between):
        v = compile_expr(node.operand, agg_subst)
        lo = compile_expr(node.low, agg_subst)
        hi = compile_expr(node.high, agg_subst)
        if node.symmetric:
            out = S.between_symmetric(v, lo, hi)
        else:
            out = S.between(v, lo, hi)
        return ~out if node.negated else out
    if isinstance(node, A.Cast):
        return _compile_cast(node, agg_subst)
    if isinstance(node, A.JsonOp):
        return _compile_json(node, agg_subst)
    if isinstance(node, A.ArrayAccess):
        arr = compile_expr(node.operand, agg_subst)
        if not node.is_slice:
            return S.array_index(arr, node.index)
        return S.array_slice(arr, node.lo, node.hi)
    if isinstance(node, A.Func):
        return _compile_func(node, agg_subst)
    if isinstance(node, A.AggFunc):
        return compile_agg(node)
    raise CompileError(f"cannot compile {type(node).__name__}")


def _compile_cast(node: A.Cast, agg_subst) -> Column:
    v = compile_expr(node.operand, agg_subst)
    t = node.to_type
    if t == "INTEGER":
        return S.cast_int(v)
    if t == "FLOAT":
        return S.cast_float(v)
    if t == "STRING":
        return S.cast_text(v)
    if t == "BOOLEAN":
        return S.cast_bool(v)
    if t == "BYTEA":
        return v.cast("binary")
    if t == "DATE":
        return v.cast("date")
    if t == "TIMESTAMP":
        return v.cast("timestamp")
    if t == "TIME":
        # Spark 4.1 has no direct timestamp→time cast (analysis error),
        # so CAST(x AS TIME) goes through the string form: a
        # date-carrying value keeps only its time-of-day part (the
        # reference's timestamp→time meaning), plain time strings and
        # time values pass straight through. Codegen string ops, no UDF.
        s = v.cast("string")
        return (
            F.when(
                s.rlike(r"^\d{4}-"),
                # 0-based get: NULL (not an ANSI error) when a
                # date-only string has no time-of-day part
                F.get(F.split(s, " "), 1),
            )
            .otherwise(s)
            .cast("time")
        )
    if t == "JSONB":
        return v.cast("string")
    if t.endswith("[]"):
        inner = {"INTEGER": "long", "FLOAT": "double", "STRING": "string",
                 "BOOLEAN": "boolean"}.get(t[:-2], "string")
        return v.cast(f"array<{inner}>")
    raise CompileError(f"unsupported cast target {t}")


def _compile_json(node: A.JsonOp, agg_subst) -> Column:
    left = compile_expr(node.left, agg_subst)
    if node.op in ("->", "->>"):
        key = _require_str_lit(node.right, node.op)
        return S.json_get(left, key)
    # #> / #>> take a path array literal
    if not isinstance(node.right, A.Arr):
        raise CompileError(f"{node.op} expects an array path literal")
    path: list[str | int] = []
    for el in node.right.items:
        if isinstance(el, A.Lit) and el.kind == "string":
            path.append(str(el.value))
        elif isinstance(el, A.Lit) and el.kind == "int":
            path.append(int(el.value))
        else:
            raise CompileError(f"{node.op} path elements must be literals")
    return S.json_path(left, path)


def _compile_func(node: A.Func, agg_subst) -> Column:
    name, args = node.name, node.args
    if name in _FUNCS_1:
        if len(args) != 1:
            raise CompileError(f"{name} expects 1 argument")
        return _FUNCS_1[name](compile_expr(args[0], agg_subst))
    if name in _FUNCS_2:
        if len(args) != 2:
            raise CompileError(f"{name} expects 2 arguments")
        return _FUNCS_2[name](
            compile_expr(args[0], agg_subst), compile_expr(args[1], agg_subst)
        )
    if name == "ARRAY_JOIN":
        arr = compile_expr(args[0], agg_subst)
        sep = _require_str_lit(args[1], "ARRAY_JOIN") if len(args) > 1 else None
        return S.array_join_(arr, sep)
    if name in ("TAKE", "TAKEEND", "DROP", "DROPEND", "CHUNKSOF"):
        # count may be any integer expression (dialect allows e.g. a column)
        n = compile_expr(args[0], agg_subst)
        s = compile_expr(args[1], agg_subst)
        fn = {"TAKE": S.take, "TAKEEND": S.takeend, "DROP": S.drop,
              "DROPEND": S.dropend, "CHUNKSOF": S.chunksof}[name]
        return fn(n, s)
    if name == "SPLIT":
        delim = _require_str_lit(args[0], "SPLIT")
        return S.split(delim, compile_expr(args[1], agg_subst))
    if name == "DATETOSTRING":
        return S.datetostring(
            compile_expr(args[0], agg_subst), _require_str_lit(args[1], name)
        )
    if name == "STRINGTODATE":
        return S.stringtodate(
            compile_expr(args[0], agg_subst), _require_str_lit(args[1], name)
        )
    if name.startswith("IS_"):
        # runtime type predicates (UnaryOp.hs:247-280 checks the value's
        # dynamic type, not castability). With declared schemas the type
        # is the column's — typeof() resolves from the schema and
        # constant-folds — but NULL is its own type in the reference
        # (FlowNull is not an int), so NULL → FALSE for every IS_*.
        v = compile_expr(args[0], agg_subst)
        t = F.typeof(v)
        int_types = ("tinyint", "smallint", "int", "bigint")
        float_types = ("float", "double")
        checks = {
            "IS_INT": t.isin(*int_types),
            "IS_FLOAT": t.isin(*float_types) | t.startswith("decimal"),
            "IS_NUM": t.isin(*int_types, *float_types) | t.startswith("decimal"),
            "IS_BOOL": t == "boolean",
            "IS_STR": t == "string",
            "IS_ARRAY": t.startswith("array"),
            "IS_DATE": t == "date",
            # native time(p) counts, and (documented divergence) so do
            # timestamps — under declared schemas the predicate is a
            # castability check, not a runtime tag
            "IS_TIME": t.isin("timestamp", "timestamp_ntz")
            | t.startswith("time("),
        }
        if name in checks:
            return v.isNotNull() & checks[name]
    raise CompileError(f"unknown function {name}")


def compile_agg(node: A.AggFunc) -> Column:
    name, args = node.name, node.args
    if name == "COUNT_ALL":
        return AGG.count_all()
    if name == "COUNT":
        return AGG.count(compile_expr(args[0]))
    if name == "SUM":
        return AGG.sum_(compile_expr(args[0]))
    if name == "MAX":
        return AGG.max_(compile_expr(args[0]))
    if name == "MIN":
        return AGG.min_(compile_expr(args[0]))
    if name == "AVG":
        return AGG.avg(compile_expr(args[0]))
    if name == "TOPK":
        return AGG.topk(compile_expr(args[0]), _require_topk_k(args[1], "TOPK"))
    if name == "TOPKDISTINCT":
        return AGG.topkdistinct(
            compile_expr(args[0]), _require_topk_k(args[1], "TOPKDISTINCT")
        )
    raise CompileError(f"unknown aggregate {name}")


def _expr_children(n):
    """Child expressions of an AST node — the ONE traversal shared by
    every expression walk (find_aggs, find_plain_colrefs): a new AST
    node's children list only needs registering here."""
    for attr in ("left", "right", "operand", "low", "high"):
        if hasattr(n, attr):
            yield getattr(n, attr)
    for attr in ("items", "args"):
        if hasattr(n, attr):
            yield from getattr(n, attr)


def find_aggs(node: Optional[A.Expr]) -> list[A.AggFunc]:
    """All AggFunc nodes in an expression tree (pre-order)."""
    out: list[A.AggFunc] = []

    def walk(n):
        if n is None:
            return
        if isinstance(n, A.AggFunc):
            out.append(n)
            return  # aggs do not nest in the dialect
        for c in _expr_children(n):
            walk(c)

    walk(node)
    return out


# ---------------------------------------------------------------------------
# FROM clause compilation
# ---------------------------------------------------------------------------


class FromInfo:
    def __init__(self, df: DataFrame, window: Optional[A.WindowedRef] = None):
        self.df = df
        self.window = window


def _compile_from(ref: A.TableRef, resolve: Resolver) -> FromInfo:
    if isinstance(ref, A.StreamRef):
        df = resolve(ref.name)
        return FromInfo(df.alias(ref.alias or ref.name))
    if isinstance(ref, A.SubqueryRef):
        df = compile_select(ref.select, resolve)
        return FromInfo(df.alias(ref.alias) if ref.alias else df)
    if isinstance(ref, A.WindowedRef):
        inner = _compile_from(ref.inner, resolve)
        if inner.window is not None:
            raise CompileError("nested windows are not supported")
        return FromInfo(inner.df, window=ref)
    if isinstance(ref, A.JoinRef):
        return FromInfo(_compile_join(ref, resolve))
    raise CompileError(f"unsupported FROM clause {type(ref).__name__}")


def _compile_join(ref: A.JoinRef, resolve: Resolver) -> DataFrame:
    left = _compile_from(ref.left, resolve)
    right = _compile_from(ref.right, resolve)
    if left.window or right.window:
        raise CompileError("window must wrap the whole FROM, not a join side")
    how = {"INNER": "inner", "LEFT": "left", "RIGHT": "right",
           "FULL": "full", "CROSS": "inner"}[ref.join_type]
    lts = left.df[EVENT_TIME_COL] if EVENT_TIME_COL in left.df.columns else None
    rts = right.df[EVENT_TIME_COL] if EVENT_TIME_COL in right.df.columns else None
    within = ref.within.seconds if ref.within else None

    def _merge_ts(joined: DataFrame) -> DataFrame:
        """Joined-record event time = max(ts_l, ts_r) (the reference's
        merged-row timestamp, Stream.hs:228-312); collapsing to ONE _ts
        also keeps further joins/windows unambiguous (V2 multi-join).
        greatest() skips nulls, so outer-join non-matches keep the
        present side's time."""
        if lts is None or rts is None:
            return joined
        return (
            joined.withColumn("__ts_m", F.greatest(lts, rts))
            .drop(EVENT_TIME_COL)
            .withColumnRenamed("__ts_m", EVENT_TIME_COL)
        )

    if ref.cond_kind == "CROSS":
        if within is not None and lts is not None and rts is not None:
            return _merge_ts(J.interval_join(left.df, right.df, None, lts, rts, within, how, ts_native=True))
        return _merge_ts(left.df.crossJoin(right.df))
    if ref.cond_kind == "ON":
        on = compile_expr(ref.on)
        if within is not None and lts is not None and rts is not None:
            return _merge_ts(J.interval_join(left.df, right.df, on, lts, rts, within, how, ts_native=True))
        return _merge_ts(left.df.join(right.df, on, how))
    if ref.cond_kind == "USING":
        cols = list(ref.using)
    else:  # NATURAL: all shared column names
        cols = [c for c in left.df.columns
                if c in set(right.df.columns) and c != EVENT_TIME_COL]
    if within is not None and lts is not None and rts is not None:
        return _merge_ts(J.interval_join_using(left.df, right.df, cols, lts, rts, within, how, ts_native=True))
    return _merge_ts(left.df.join(right.df, cols, how))


# ---------------------------------------------------------------------------
# SELECT compilation
# ---------------------------------------------------------------------------


def compile_select(
    sel: A.Select, resolve: Resolver, keep_event_time: bool = False
) -> DataFrame:
    """``keep_event_time`` (continuous queries writing to streams):
    carry the record timestamp through the projection — reference
    records always have one (srcTimestamp propagated end-to-end,
    Processor.hs:263-275). Non-aggregated output keeps the source _ts;
    windowed aggregation emits window_end as the new event time;
    unwindowed aggregation leaves it to the sink (append time)."""
    if sel.from_ is None:
        raise CompileError("SELECT without FROM is not supported")
    src = _compile_from(sel.from_, resolve)
    df = src.df

    if sel.where is not None:
        df = df.filter(compile_expr(sel.where))

    item_aggs = {id(it): find_aggs(it.expr) for it in sel.items}
    having_aggs = find_aggs(sel.having)
    all_aggs = [a for aggs in item_aggs.values() for a in aggs] + having_aggs
    is_aggregated = bool(all_aggs) or bool(sel.group_by) or src.window is not None

    if not is_aggregated:
        out_cols: list[Column] = []
        has_wildcard = False
        for it in sel.items:
            if it.wildcard:
                has_wildcard = True
                out_cols.append(
                    F.col(f"{it.wildcard_stream}.*") if it.wildcard_stream else F.col("*")
                )
            else:
                out_cols.append(compile_expr(it.expr).alias(it.alias or it.text))
        if (
            keep_event_time
            and EVENT_TIME_COL in df.columns
            and not has_wildcard
            and not any(it.text == EVENT_TIME_COL or it.alias == EVENT_TIME_COL
                        for it in sel.items)
        ):
            out_cols.append(F.col(EVENT_TIME_COL))
        return df.select(*out_cols)

    # --- Reduce node -------------------------------------------------------
    if src.window is not None and src.window.window_kind == "SLIDING":
        return _compile_sliding(sel, src, df, all_aggs, keep_event_time)

    group_cols: list[Column] = []
    key_names: list[str] = []
    if src.window is not None:
        w = src.window
        ts = F.col(EVENT_TIME_COL)
        if w.window_kind == "TUMBLE":
            group_cols.append(F.window(ts, w.size.spark_str).alias("window"))
        elif w.window_kind == "HOP":
            group_cols.append(
                F.window(ts, w.size.spark_str, w.advance.spark_str).alias("window")
            )
        else:
            group_cols.append(F.session_window(ts, w.size.spark_str).alias("window"))
    for key in sel.group_by:
        name = f"{key.stream}.{key.name}" if key.stream else key.name
        group_cols.append(F.col(name))
        key_names.append(key.name)

    agg_subst: dict[int, str] = {}
    agg_exprs: list[Column] = []
    seen: dict[str, str] = {}  # textual agg key → hidden name (dedup rewrite)
    for i, agg_node in enumerate(all_aggs):
        key = f"{agg_node.name}:{[repr(a) for a in agg_node.args]}"
        if key in seen:
            agg_subst[id(agg_node)] = seen[key]
            continue
        hidden = f"__agg{i}"
        seen[key] = hidden
        agg_subst[id(agg_node)] = hidden
        agg_exprs.append(compile_agg(agg_node).alias(hidden))

    if not agg_exprs:
        agg_exprs.append(AGG.count_all().alias("__agg_dummy"))

    df = df.groupBy(*group_cols).agg(*agg_exprs)

    if sel.having is not None:
        df = df.filter(compile_expr(sel.having, agg_subst))

    out_cols = []
    if src.window is not None:
        out_cols.append(F.col("window.start").alias("window_start"))
        out_cols.append(F.col("window.end").alias("window_end"))
    for it in sel.items:
        if it.wildcard:
            # wildcard over an aggregated relation = keys (reference keeps
            # group keys + accumulator row)
            out_cols.extend([F.col(k) for k in key_names])
            continue
        out_cols.append(compile_expr(it.expr, agg_subst).alias(it.alias or it.text))
    if keep_event_time and src.window is not None:
        # windowed aggregate records time-stamp at the window close
        out_cols.append(F.col("window.end").alias(EVENT_TIME_COL))
    return df.select(*out_cols)


def _compile_sliding(
    sel: A.Select,
    src: FromInfo,
    df: DataFrame,
    all_aggs: list,
    keep_event_time: bool,
) -> DataFrame:
    """SLIDING window (V2 engine, SQL-v2.cf:119) — per-record trailing
    aggregate: each output row is the group's aggregate over records with
    _ts in (row_ts - size, row_ts], i.e. the V2 update stream sampled at
    event arrivals (Handler/Common.hs:97-105 inserts a record at t and
    retracts it at t + size). Compiled as a range-frame window function:
    one shuffle on the GROUP BY keys, no self-join."""
    from pyspark.sql import Window as SparkWindow

    key_names = [f"{k.stream}.{k.name}" if k.stream else k.name for k in sel.group_by]
    us = F.unix_micros(F.col(EVENT_TIME_COL))
    size_us = src.window.size.seconds * 1_000_000
    spec = (
        SparkWindow.partitionBy(*[F.col(k) for k in key_names])
        .orderBy(us)
        .rangeBetween(-(size_us - 1), 0)
    )

    agg_subst: dict[int, str] = {}
    seen: dict[str, str] = {}
    for i, agg_node in enumerate(all_aggs):
        key = f"{agg_node.name}:{[repr(a) for a in agg_node.args]}"
        if key in seen:
            agg_subst[id(agg_node)] = seen[key]
            continue
        hidden = f"__agg{i}"
        seen[key] = hidden
        agg_subst[id(agg_node)] = hidden
        if agg_node.name in ("TOPK", "TOPKDISTINCT"):
            # .over() must attach to the AGGREGATE itself — applying it
            # to the slice(sort_array(collect_list)) composition leaves
            # a bare collect_list Spark rejects with MISSING_GROUP_BY
            val = compile_expr(agg_node.args[0])
            k = _require_topk_k(agg_node.args[1], agg_node.name)
            base_fn = (F.collect_list if agg_node.name == "TOPK"
                       else F.collect_set)
            df = df.withColumn(hidden, AGG.topk_of(base_fn(val).over(spec), k))
        else:
            df = df.withColumn(hidden, compile_agg(agg_node).over(spec))

    if sel.having is not None:
        df = df.filter(compile_expr(sel.having, agg_subst))

    out_cols: list[Column] = []
    for it in sel.items:
        if it.wildcard:
            out_cols.extend([F.col(k) for k in key_names])
            continue
        out_cols.append(compile_expr(it.expr, agg_subst).alias(it.alias or it.text))
    if keep_event_time and EVENT_TIME_COL in df.columns:
        # each output row keeps its triggering record's event time
        out_cols.append(F.col(EVENT_TIME_COL))
    return df.select(*out_cols)


_SESSION_AGG_KIND = {
    "COUNT_ALL": "count_all",
    "COUNT": "count",
    "SUM": "sum",
    "MIN": "min",
    "MAX": "max",
    "AVG": "avg",
    # bounded top-k: the state partial is the k largest values seen so
    # far (merge = merge-sort + cap), so TOPK/TOPKDISTINCT session
    # views ride the stateful update path instead of the complete-mode
    # fallback (round 9)
    "TOPK": "topk",
    "TOPKDISTINCT": "topkdistinct",
}
_TOPK_KINDS = ("topk", "topkdistinct")


def find_plain_colrefs(node: Optional[A.Expr]) -> list[A.ColRef]:
    """All ColRef nodes NOT inside an aggregate call (pre-order) —
    the columns an expression needs from the post-aggregation frame."""
    out: list[A.ColRef] = []

    def walk(n):
        if n is None or isinstance(n, A.AggFunc):
            return
        if isinstance(n, A.ColRef):
            out.append(n)
            return
        for c in _expr_children(n):
            walk(c)

    walk(node)
    return out


def _compile_stateful_window(
    sel: A.Select,
    resolve: Resolver,
    window_kind: str,
    keep_ts: bool = False,
    hidden_keys: Optional[list] = None,
    having_col: Optional[str] = None,
) -> Optional[DataFrame]:
    """Shared Reduce-node compilation for the custom stateful window
    operators (SESSION update stream, SLIDING retract buffer).

    Items may be group-key references or ARBITRARY expressions over the
    supported aggregates (COUNT/COUNT(*)/SUM/MIN/MAX/AVG, and — round
    9 — TOPK/TOPKDISTINCT with an int-literal k ≥ 1): each unique
    aggregate call computes once as a hidden stateful output and the
    item expressions project over those (the same agg-dedup rewrite as
    the batch path, Planner.hs:352-367). HAVING compiles as a hidden
    boolean output when the caller passes ``having_col`` (read-time
    filtering). Returns None when the shape exceeds the operator
    (wildcard, non-key plain columns, non-numeric MIN/MAX/TOPK,
    HAVING without having_col or over non-key/qualified plain
    columns, non-literal or non-positive TOPK k) — callers fall back
    or raise.
    """
    if sel.from_ is None:
        return None
    src = _compile_from(sel.from_, resolve)
    if src.window is None or src.window.window_kind != window_kind:
        return None
    if sel.having is not None:
        # HAVING over a stateful-window view compiles as a hidden
        # boolean OUTPUT column (filtered at view-READ time by the
        # runtime, never inside the operator: a session/window can later
        # GROW into satisfying the predicate, so the state must keep
        # non-passing groups). Callers that can't do read-side filtering
        # (EMIT CHANGES, continuous queries) pass no having_col and keep
        # the old fall-back behavior.
        if having_col is None:
            return None
        key_set = {k.name for k in sel.group_by}
        if any(c.stream is not None or c.name not in key_set
               for c in find_plain_colrefs(sel.having)):
            # non-key plain column in HAVING: fall back. STREAM-QUALIFIED
            # refs fall back too — the stateful output frame's columns
            # are unqualified, so `HAVING ev.k <> 'x'` would compile to
            # an unresolvable F.col("ev.k") and turn the graceful
            # fallback into a hard AnalysisException at CREATE VIEW
            return None
    df = src.df
    if EVENT_TIME_COL not in df.columns:
        return None
    if sel.where is not None:
        df = df.filter(compile_expr(sel.where))

    key_names = [k.name for k in sel.group_by]
    key_refs = [f"{k.stream}.{k.name}" if k.stream else k.name for k in sel.group_by]

    # unique supported aggregates across all items -> hidden outputs
    kinds: list[str] = []
    in_exprs: list[Optional[Column]] = []
    hidden: list[str] = []
    agg_subst: dict[int, str] = {}
    seen: dict[str, str] = {}
    params: list[Optional[int]] = []

    def note_agg(node) -> bool:
        key = f"{node.name}:{[repr(a) for a in node.args]}"
        if key in seen:
            agg_subst[id(node)] = seen[key]
            return True
        kind = _SESSION_AGG_KIND.get(node.name)
        if kind is None:
            return False
        if kind in _TOPK_KINDS:
            # k must be an int literal ≥ 1 — anything else falls back
            # to the batch/complete path, which rejects it LOUDLY
            # (a capped partial would silently truncate cur[:k] to []
            # for k < 1 and emit empty arrays forever). SESSION carries
            # capped top-k partials in state; SLIDING folds each window
            # fresh from its raw-event buffer.
            if not (len(node.args) == 2 and isinstance(node.args[1], A.Lit)
                    and node.args[1].kind == "int"
                    and int(node.args[1].value) >= 1):
                return False
            params.append(int(node.args[1].value))
        else:
            params.append(None)
        name = f"__agg{len(hidden)}"
        seen[key] = name
        agg_subst[id(node)] = name
        hidden.append(name)
        kinds.append(kind)
        in_exprs.append(compile_expr(node.args[0]) if node.args else None)
        return True

    for it in sel.items:
        if it.wildcard:
            return None
        aggs = find_aggs(it.expr)
        if not aggs:
            if not (isinstance(it.expr, A.ColRef) and it.expr.name in key_names):
                return None
            continue
        for node in aggs:
            if not note_agg(node):
                return None
    for node in find_aggs(sel.having):
        # HAVING's aggregates compute as hidden stateful outputs too
        # (deduped against the items' — HAVING COUNT(*) > 2 with
        # COUNT(*) projected costs nothing extra)
        if not note_agg(node):
            return None

    # project group keys + event-time micros + aggregate inputs; the
    # watermarked _ts column stays in the frame so the watermark node
    # survives into the stateful operator (late-row filtering + eviction)
    proj: list[Column] = [F.col(EVENT_TIME_COL)]
    proj += [F.col(r).alias(n) for r, n in zip(key_refs, key_names)]
    proj.append(F.unix_micros(F.col(EVENT_TIME_COL)).alias("__ts_us"))
    input_cols: list[Optional[str]] = []
    for j, e in enumerate(in_exprs):
        if e is None:
            input_cols.append(None)
        else:
            proj.append(e.alias(f"__in{j}"))
            input_cols.append(f"__in{j}")
    sdf = df.select(*proj)

    dtypes = dict(sdf.dtypes)
    int_types = {"tinyint", "smallint", "int", "bigint", "long"}
    out_casts = []
    for j, kind in enumerate(kinds):
        if kind in ("count_all", "count"):
            out_casts.append("bigint")
        elif kind == "avg":
            out_casts.append("double")
        else:
            t = dtypes[input_cols[j]]
            if t in int_types:
                elem = "bigint"
            elif t in ("double", "float", "decimal"):
                elem = "double"
            else:
                return None  # non-numeric MIN/MAX/TOPK: fall back
            out_casts.append(f"array<{elem}>" if kind in _TOPK_KINDS else elem)
    key_ddl = ", ".join(f"`{n}` {dtypes[n]}" for n in key_names)

    size_us = src.window.size.seconds * 1_000_000
    if window_kind == "SESSION":
        from hstream_spark.streaming.stateful import session_aggregate

        out = session_aggregate(
            sdf, key_names, "__ts_us", size_us, kinds, input_cols,
            hidden, out_casts, key_ddl, params=params,
        )
    else:
        from hstream_spark.streaming.stateful import sliding_aggregate

        out = sliding_aggregate(
            sdf, key_names, "__ts_us", size_us, kinds, input_cols,
            hidden, out_casts, key_ddl, params=params,
        )

    final: list[Column] = []
    if window_kind == "SESSION":
        final += [F.col("window_start"), F.col("window_end")]
    for it in sel.items:
        name = it.alias or it.text
        if find_aggs(it.expr):
            final.append(compile_expr(it.expr, agg_subst).alias(name))
        else:
            final.append(F.col(it.expr.name).alias(name))
    if sel.having is not None and having_col is not None:
        final.append(
            compile_expr(sel.having, agg_subst).cast("boolean").alias(having_col)
        )
    for key_name, alias in hidden_keys or ():
        # a GROUP BY key the projection drops still keys the view state:
        # without it a SESSION view's overlap anti-join would evict OTHER
        # groups' overlapping sessions and a SLIDING view would read back
        # keyless (newest delta only). The stateful output carries every
        # group key, so project the missing ones under hidden aliases —
        # the runtime keys the upsert on them and strips them on read.
        final.append(F.col(key_name).alias(alias))
    if keep_ts:
        # view upsert orders by this to keep each key's LATEST trailing
        # aggregate (the V2 materialized-view read of an update stream)
        final.append(F.col("__ts_us").alias("__slide_ts"))
    return out.select(*final)


def compile_select_session_update(
    sel: A.Select, resolve: Resolver, hidden_keys: Optional[list] = None,
    having_col: Optional[str] = None,
) -> Optional[DataFrame]:
    """Streaming SESSION-window aggregation as an UPDATE stream.

    Spark's built-in session_window only runs in append/complete output
    modes (merging sessions defeat its update-mode bookkeeping), so a
    SESSION view compiled the normal way silently degrades to a full-
    result refresh per trigger — a scale-killer for large key spaces.
    This path routes the Reduce node through the custom
    ``stateful.session_aggregate`` (applyInPandasWithState, bounded
    state, per-trigger deltas) instead.
    """
    return _compile_stateful_window(sel, resolve, "SESSION",
                                    hidden_keys=hidden_keys,
                                    having_col=having_col)


def compile_select_sliding_update(
    sel: A.Select, resolve: Resolver, keep_ts: bool = False,
    hidden_keys: Optional[list] = None,
    having_col: Optional[str] = None,
) -> Optional[DataFrame]:
    """Streaming SLIDING-window aggregation (the V2 engine's native
    mode): per-record trailing aggregates need window functions, which
    streaming Spark lacks, so this routes the Reduce node through
    ``stateful.sliding_aggregate`` (raw events in bounded state,
    insert-at-t / retract-at-t+size — Handler/Common.hs:97-105).
    Emission is append-per-record, matching the batch range-frame
    compilation sampled at arrivals.
    """
    return _compile_stateful_window(sel, resolve, "SLIDING", keep_ts=keep_ts,
                                    hidden_keys=hidden_keys,
                                    having_col=having_col)


def explain(sel: A.Select, resolve: Resolver) -> str:
    df = compile_select(sel, resolve)
    return df._jdf.queryExecution().toString()
