"""OML (Object Modeling Language) AST.

Shapes mirror the reference's syntax tree (crates/wp-oml/src/language/syntax/
evaluators/precise.rs:43-60 statement forms; operations/matchs.rs:81-113 match
conditions; parser/sql_prm.rs SQL enrichment), re-expressed as plain Python
dataclasses that the Spark compiler consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ----------------------------------------------------------------- primitives


@dataclass
class Literal:
    """Typed literal `chars(v)` / `digit(5)` / `ip(10.0.0.1)` / `time(...)`."""

    dtype: str
    value: str


@dataclass
class FunCall:
    """Pipe/condition function call: `Time::to_ts_zone(8, s)`, `nth(0)`,
    `starts_with('p')`."""

    name: str  # normalized lower, namespace kept: "time::to_ts_zone"
    args: list[str] = field(default_factory=list)
    # pre-unquote spellings (same order as args): lets arg-typed functions
    # (map_to) distinguish map_to('200') (chars) from map_to(200) (digit)
    raw_args: list[str] = field(default_factory=list)


@dataclass
class Accessor:
    """`read(...)` / `take(...)` with optional default clause.

    Exactly one of (`field`, `options`, `keys`) is set, or none for bare
    `read()` (resolved against the assignment target's name).
    """

    kind: str  # "read" | "take"
    field: str | None = None
    options: list[str] | None = None
    keys: list[str] | None = None
    default: "Expr | None" = None
    # `get : <key>` arg (grammar arg = "get" ":" simple): navigate INTO
    # the resolved value (struct field / map key / JSON object key)
    get_path: str | None = None


@dataclass
class FieldRef:
    """`@name` — reference to a previously computed output field."""

    name: str


@dataclass
class SymbolRef:
    """Bare identifier expression — a static-pool or output-field symbol."""

    name: str


@dataclass
class Builtin:
    """`Now::time()` / `Now::date()` / `Now::hour()`."""

    name: str


@dataclass
class PipeExpr:
    """`[pipe] source | fn | fn ...`"""

    source: "Expr"
    fns: list[FunCall] = field(default_factory=list)


@dataclass
class FmtExpr:
    """`fmt("{a}:{b}", read(a), read(b))`"""

    template: str
    args: list["Expr"] = field(default_factory=list)


# ----------------------------------------------------------------- match


@dataclass
class RangeCond:
    """`in (digit(0), digit(1000))` closed interval."""

    lo: Literal
    hi: Literal


@dataclass
class MatchCond:
    """One condition position: OR-alternatives, optionally negated.

    alts items: Literal | RangeCond | FunCall (function condition).
    """

    alts: list[object]
    negate: bool = False


@dataclass
class MatchArm:
    """`conds => result ;` — conds has one entry per match source;
    None conds = the default `_` arm."""

    conds: list[MatchCond] | None
    result: "Expr"


@dataclass
class MatchExpr:
    sources: list["Expr"]
    arms: list[MatchArm] = field(default_factory=list)


# ----------------------------------------------------------------- composite


@dataclass
class ObjectExpr:
    """`object { ...assignments }` -> struct."""

    statements: list["Assign"] = field(default_factory=list)


@dataclass
class CollectExpr:
    """`collect read(keys:[...])` -> array."""

    accessor: Accessor


# ----------------------------------------------------------------- SQL enrich


@dataclass
class SqlCond:
    """One WHERE conjunct: `col op param` (op in =, <=, >=, <, >) or the
    rewritten `ip4_between` range form. `param` may be an Expr (read/take/
    Now::*) or a Literal-ish python value; `ip4` wraps the param in
    ip4_int()."""

    column: str
    op: str
    param: object  # Expr | str | int | float
    ip4: bool = False


@dataclass
class SqlExpr:
    """`select a, b from tbl where x = read(f) and ...`"""

    columns: list[str]
    table: str
    conds: list[SqlCond] = field(default_factory=list)


# ----------------------------------------------------------------- statements


@dataclass
class Assign:
    """`t1, t2 : type = expr ;` — targets may include `_` (discard) and `*`
    (wildcard passthrough)."""

    targets: list[str]
    dtype: str | None
    expr: "Expr"


@dataclass
class OmlModel:
    name: str
    rule_patterns: list[str] = field(default_factory=list)
    # `enable : false` header — a disabled model is skipped at load time
    # (resources/core/manager/loading.rs:50-53; defaults true per
    # oml_conf.rs test_enable_config_default)
    enable: bool = True
    statics: list[Assign] = field(default_factory=list)
    statements: list[Assign] = field(default_factory=list)
    # third `---` section: output field -> privacy_* desensitization type
    # (OML grammar 隐私段; the reference parses but does not ship a
    # runtime masker — we apply deterministic masks at output time)
    privacy: dict[str, str] = field(default_factory=dict)


Expr = (
    Literal
    | Accessor
    | FieldRef
    | SymbolRef
    | Builtin
    | PipeExpr
    | FmtExpr
    | MatchExpr
    | ObjectExpr
    | CollectExpr
    | SqlExpr
)
