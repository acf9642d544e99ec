"""AST for the HStream SQL dialect.

Node set mirrors the refined AST of the reference
(hstream-sql/src/HStream/SQL/AST.hs) at the granularity our planner
needs; grammar surface per hstream-sql/etc/SQL-v1.cf.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

# ---------------------------------------------------------------------------
# expressions
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: object  # int | float | str | bool | None
    kind: str  # "int" | "float" | "string" | "bool" | "null" | "date" | "time" | "timestamp"


@dataclass
class Interval:
    amount: int
    unit: str  # SECOND | MINUTE | HOUR | DAY | MONTH | YEAR

    @property
    def seconds(self) -> int:
        scale = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400,
                 "MONTH": 30 * 86400, "YEAR": 365 * 86400}
        return self.amount * scale[self.unit]

    @property
    def spark_str(self) -> str:
        return f"{self.amount} {self.unit.lower()}s"


@dataclass
class ColRef:
    name: str
    stream: Optional[str] = None


@dataclass
class Arr:
    items: list["Expr"]


@dataclass
class BinOp:
    op: str  # OR AND = <> < > <= >= + - *
    left: "Expr"
    right: "Expr"


@dataclass
class UnOp:
    op: str  # NOT
    operand: "Expr"


@dataclass
class Between:
    operand: "Expr"
    low: "Expr"
    high: "Expr"
    negated: bool = False
    symmetric: bool = False


@dataclass
class Cast:
    operand: "Expr"
    to_type: str  # INTEGER FLOAT BOOLEAN BYTEA STRING DATE TIME TIMESTAMP INTERVAL JSONB or T[]


@dataclass
class JsonOp:
    op: str  # -> ->> #> #>>
    left: "Expr"
    right: "Expr"


@dataclass
class ArrayAccess:
    operand: "Expr"
    index: Optional[int] = None  # arr[i]
    lo: Optional[int] = None  # arr[i:], arr[i:j]
    hi: Optional[int] = None  # arr[:j], arr[i:j]
    is_slice: bool = False


@dataclass
class Func:
    name: str
    args: list["Expr"]


@dataclass
class AggFunc:
    name: str  # COUNT COUNT_ALL AVG SUM MAX MIN TOPK TOPKDISTINCT
    args: list["Expr"]


Expr = Union[Lit, Interval, ColRef, Arr, BinOp, UnOp, Between, Cast, JsonOp,
             ArrayAccess, Func, AggFunc]

# ---------------------------------------------------------------------------
# FROM clause
# ---------------------------------------------------------------------------


@dataclass
class StreamRef:
    name: str
    alias: Optional[str] = None


@dataclass
class SubqueryRef:
    select: "Select"
    alias: Optional[str] = None


@dataclass
class WindowedRef:
    inner: "TableRef"
    window_kind: str  # TUMBLE | HOP | SESSION | SLIDING (V2, SQL-v2.cf:119)
    size: Interval
    advance: Optional[Interval] = None  # HOP only


@dataclass
class JoinRef:
    left: "TableRef"
    right: "TableRef"
    join_type: str  # INNER LEFT RIGHT FULL CROSS
    cond_kind: str  # ON | USING | NATURAL | CROSS
    on: Optional[Expr] = None
    using: list[str] = field(default_factory=list)
    within: Optional[Interval] = None


TableRef = Union[StreamRef, SubqueryRef, WindowedRef, JoinRef]

# ---------------------------------------------------------------------------
# statements
# ---------------------------------------------------------------------------


@dataclass
class SelectItem:
    expr: Optional[Expr]  # None for wildcards
    alias: Optional[str] = None
    wildcard: bool = False
    wildcard_stream: Optional[str] = None
    text: str = ""  # source text (column name for unaliased exprs)


@dataclass
class Select:
    items: list[SelectItem]
    from_: Optional[TableRef]
    where: Optional[Expr] = None
    group_by: list[ColRef] = field(default_factory=list)
    having: Optional[Expr] = None
    emit_changes: bool = False


@dataclass
class SchemaColumn:
    name: str
    data_type: str


@dataclass
class CreateStream:
    name: str
    columns: list[SchemaColumn] = field(default_factory=list)
    options: dict[str, object] = field(default_factory=dict)


@dataclass
class CreateStreamAs:
    name: str
    select: Select
    options: dict[str, object] = field(default_factory=dict)


@dataclass
class CreateView:
    name: str
    select: Select
    # WITH (DURATION = INTERVAL …) — view-state retention, mirroring
    # CREATE STREAM's DURATION backlog option (SQL-v1.cf:53)
    options: dict = field(default_factory=dict)


@dataclass
class CreateConnector:
    kind: str  # SOURCE | SINK
    name: str
    target: str  # FROM/TO stream
    if_not_exist: bool = False
    options: dict[str, object] = field(default_factory=dict)


@dataclass
class Insert:
    stream: str
    columns: list[str] = field(default_factory=list)
    values: list[Expr] = field(default_factory=list)
    raw: Optional[Expr] = None  # INSERT INTO s VALUES '<json>'
    select: Optional[Select] = None  # INSERT INTO s SELECT ...


@dataclass
class Show:
    what: str  # QUERIES | STREAMS | CONNECTORS | VIEWS


@dataclass
class Drop:
    what: str  # CONNECTOR | STREAM | VIEW | QUERY
    name: str
    if_exists: bool = False


@dataclass
class Terminate:
    name: str


@dataclass
class Explain:
    stmt: Union[Select, CreateStreamAs, CreateView]


@dataclass
class Pause:
    what: str  # CONNECTOR | QUERY
    name: str


@dataclass
class Resume:
    what: str
    name: str


Statement = Union[Select, CreateStream, CreateStreamAs, CreateView,
                  CreateConnector, Insert, Show, Drop, Terminate, Explain,
                  Pause, Resume]
