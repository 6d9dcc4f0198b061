"""OML AST -> Spark transform (Column expression DAG).

The reference evaluates statements per record in program order
(crates/wp-oml/src/core/model/object.rs:20-41). Here every statement
compiles to Column expressions at plan time — one `select` per model, all
JVM-side, map-only (plus broadcast joins for SQL enrichment). Catalyst
constant-folds static blocks (the reference's `finalize_static_blocks`
optimization) and prunes `__temp` intermediates for free.

Semantics carried over (SURVEY.md §2.5):
- read = non-destructive, take = destructive (plan-time `taken` set;
  re-take of a consumed field falls to the default clause / Ignore).
- Resolution order for reads: previously computed outputs first (this is
  how `@ref`, `__temp` read-back, and static symbols behave in the
  reference), then input columns.
- `Value::Ignore` soft-null == SQL NULL throughout.
- `* = take()` -> passthrough of all not-yet-taken input columns.
- `__x` temp targets are computed but dropped from the final projection
  (object.rs:29-38 "zero-cost abstraction" — here: column pruning).
- SQL enrichment -> broadcast LEFT join per statement, first-row semantics
  approximated by de-duplicating the dimension on its join keys.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from wp_motor_spark.oml import functions as ofn
from wp_motor_spark.oml.ast import (
    Accessor,
    Assign,
    Builtin,
    CollectExpr,
    FieldRef,
    FmtExpr,
    FunCall,
    Literal,
    MatchCond,
    MatchExpr,
    ObjectExpr,
    OmlModel,
    PipeExpr,
    RangeCond,
    SqlExpr,
    SymbolRef,
)
from wp_motor_spark.oml.parser import parse_oml


class OmlCompileError(ValueError):
    pass


_CAST = {
    "chars": "string",
    "symbol": "string",
    "hex": "string",
    "ip": "string",
    "digit": "long",
    "float": "double",
    "bool": "boolean",
    "time": "timestamp",
    "array": None,  # keep as-is
}


@dataclass
class _Val:
    col: Column
    kind: str | None = None  # "struct" | "array" | None (scalar/unknown)
    dtype: object | None = None  # Spark dtype when read straight off the input


def _glob_to_re(glob: str) -> re.Pattern:
    return re.compile("^" + re.escape(glob).replace(r"\*", ".*") + "$")


def _navigate(v: "_Val", path: str) -> "_Val":
    """Descend into a value by slash path: struct fields, map keys, or
    JSON-string object keys (the shared logic behind the `get` pipe, the
    accessor's `get:` arg and `/a/b/c` read paths)."""
    if v.kind == "struct":
        out = v.col
        for seg in path.split("/"):
            out = out.getField(seg)
        return _Val(out)
    if v.kind == "map":
        # descend per segment so nested maps resolve (map<string,map<...>>);
        # a plain map<string,string> with extra segments is a schema error
        # Spark reports at analysis time
        out = v.col
        for seg in path.split("/"):
            out = F.try_element_at(out, F.lit(seg))
        return _Val(out)
    return _Val(ofn.get_path(v.col.cast("string"), path))


def _typed_lit(lit: Literal) -> Column:
    v = lit.value
    if lit.dtype == "digit":
        return F.lit(int(v))
    if lit.dtype == "float":
        return F.lit(float(v))
    if lit.dtype == "bool":
        return F.lit(v.strip().lower() == "true")
    if lit.dtype == "time":
        return F.try_to_timestamp(F.lit(v))
    return F.lit(v)


class OmlTransform:
    """Compiled OML model: ``apply(df, knowdb)`` -> transformed DataFrame."""

    def __init__(self, model: OmlModel):
        self.model = model
        self._patterns = [p.strip().lstrip("/") for p in model.rule_patterns]

    # -- model selection (language/types/model.rs:96-111 WildArray match) ----

    def matches(self, rule_key: str) -> bool:
        key = rule_key.strip().lstrip("/")
        if not self._patterns:
            return True
        return any(_glob_to_re(p).match(key) for p in self._patterns)

    # ------------------------------------------------------------------ apply

    def apply(self, df: DataFrame, knowdb=None) -> DataFrame:
        st = _State(df, knowdb)
        for a in self.model.statics:
            if len(a.targets) != 1:
                raise OmlCompileError("static block assignments are single-target")
            st.statics[a.targets[0]] = st.compile_expr(a.expr, target=a.targets[0])
        for a in self.model.statements:
            st.run_assign(a)
        for fname, ptype in self.model.privacy.items():
            v = st.outputs.get(fname)
            if v is not None:
                st.outputs[fname] = _Val(_privacy_mask(v.col, ptype), v.kind)
            elif st.passthrough and fname in st.input_cols:
                # `* = take()` passthrough would otherwise emit the RAW
                # field, silently bypassing its declared mask — promote it
                # to an explicit (masked) output; finish() then skips the
                # raw passthrough copy because the name is in outputs.
                st.outputs[fname] = _Val(_privacy_mask(F.col(fname), ptype))
        return st.finish()


class _State:
    def __init__(self, df: DataFrame, knowdb):
        self.df = df
        self.knowdb = knowdb
        self.input_cols = list(df.columns)
        self.schema = {f.name: f.dataType for f in df.schema.fields}
        self.outputs: dict[str, _Val] = {}
        self.temps: set[str] = set()
        self.statics: dict[str, _Val] = {}
        self.taken: set[str] = set()
        self.passthrough = False
        self._sql_idx = 0

    # ----------------------------------------------------------- field access

    def _kind_of_input(self, name: str) -> str | None:
        dt = self.schema.get(name)
        if isinstance(dt, T.StructType):
            return "struct"
        if isinstance(dt, T.ArrayType):
            return "array"
        if isinstance(dt, (T.MapType,)):
            return "map"
        return None

    def lookup(self, name: str) -> _Val | None:
        """outputs -> statics -> input columns."""
        if name in self.outputs:
            return self.outputs[name]
        if name in self.statics:
            return self.statics[name]
        if name in self.input_cols:
            return _Val(F.col(name), self._kind_of_input(name), self.schema.get(name))
        return None

    def _input_read(self, name: str) -> _Val | None:
        """read(): the SOURCE record wins — an output that reuses an input
        field's name must not shadow it (the complete-example doc reassigns
        timestamp_zone and then read()s the original; prior-output access
        is spelled @name/FieldRef, which stays outputs-first)."""
        if name in self.input_cols:
            return _Val(F.col(name), self._kind_of_input(name), self.schema.get(name))
        if name in self.statics:
            return self.statics[name]
        if name in self.outputs:
            return self.outputs[name]
        return None

    def _input_take(self, name: str) -> _Val | None:
        """take(): destructive — consumed fields read as absent. The move
        is keyed on the SOURCE record only: an output that reuses the
        consumed input's name does NOT feed a later take (test_case.rs
        test_crate_move — 'A1 = take(A1); A2 = take(A1);' leaves A2
        absent, even though output A1 exists). Prior outputs stay
        reachable through read()/@ref."""
        if name in self.input_cols:
            if name in self.taken:
                return None
            self.taken.add(name)
            return _Val(F.col(name), self._kind_of_input(name), self.schema.get(name))
        if name in self.outputs:  # taking a purely computed field: visible
            return self.outputs[name]
        return None

    def glob_fields(self, glob: str) -> list[str]:
        rx = _glob_to_re(glob)
        hits = [c for c in self.input_cols if rx.match(c)]
        hits += [c for c in self.outputs if rx.match(c) and c not in hits]
        return hits

    # ------------------------------------------------------------- statements

    def run_assign(self, a: Assign) -> None:
        expr = a.expr
        # wildcard passthrough: * = take()
        if a.targets == ["*"] and isinstance(expr, Accessor):
            if expr.keys:
                for f in [h for g in expr.keys for h in self.glob_fields(g)]:
                    self._emit(f, self.lookup(f) or _Val(F.lit(None)), a.dtype)
                    if expr.kind == "take":
                        self.taken.add(f)
            else:
                self.passthrough = True
                if expr.kind == "take":
                    # remaining fields move to output; nothing left to take
                    pass
            return
        # glob target (目标通配): alert* / *_log = take() — matching input
        # fields pass through under their own names
        if (
            len(a.targets) == 1
            and "*" in a.targets[0]
            and a.targets[0] != "*"
            and isinstance(expr, Accessor)
            and not (expr.field or expr.keys or expr.options)
        ):
            for f in self.glob_fields(a.targets[0]):
                v = self._input_take(f) if expr.kind == "take" else self._input_read(f)
                if v is not None:
                    self._emit(f, v, a.dtype)
            return
        if isinstance(expr, SqlExpr):
            self._run_sql(a, expr)
            return
        if isinstance(expr, Accessor) and expr.keys and len(a.targets) == 1:
            # batch glob read/take: matched fields pass through under their
            # own names (BatchEvalExp, evaluators/pattern.rs:12)
            for f in [h for g in expr.keys for h in self.glob_fields(g)]:
                v = self._input_take(f) if expr.kind == "take" else self._input_read(f)
                if v is not None:
                    self._emit(f, v, a.dtype)
            return
        vals = self._expr_values(expr, a.targets)
        for tgt, v in zip(a.targets, vals):
            if tgt == "_":
                continue
            self._emit(tgt, v, a.dtype)

    def _emit(self, name: str, v: _Val, dtype: str | None) -> None:
        col = v.col
        if dtype:
            base = dtype.split("/")[0]
            cast = _CAST.get(base)
            if cast and v.kind is None:
                col = col.try_cast(cast)
        if name.startswith("__"):
            self.temps.add(name)
        self.outputs[name] = _Val(col.alias(name), v.kind)

    def _expr_values(self, expr, targets: list[str]) -> list[_Val]:
        """Evaluate an expression for N targets (multi-target forms)."""
        n = len(targets)
        if isinstance(expr, Accessor) and n > 1:
            if expr.options and len(expr.options) >= n:
                # positional multi-target over the option list (§1.6)
                return [self._accessor_one(expr, f) for f in expr.options[:n]]
            if expr.field is None and expr.options is None and expr.keys is None:
                # bare read(): each target reads its own name (§1.5)
                return [self._accessor_one(expr, t) for t in targets]
            return [self.compile_expr(expr, target=t) for t in targets]
        return [self.compile_expr(expr, target=targets[0])] * n

    # ------------------------------------------------------------ expressions

    def compile_expr(self, expr, target: str | None = None) -> _Val:
        if isinstance(expr, Literal):
            return _Val(_typed_lit(expr))
        if isinstance(expr, Builtin):
            return _Val(self._builtin(expr.name))
        if isinstance(expr, FieldRef):
            v = self.lookup(expr.name)
            if v is None:
                raise OmlCompileError(f"@{expr.name}: no such output field")
            return v
        if isinstance(expr, SymbolRef):
            v = self.lookup(expr.name)
            if v is None:
                raise OmlCompileError(f"symbol {expr.name!r} not found (static pool/outputs/input)")
            return v
        if isinstance(expr, Accessor):
            return self._accessor_one(expr, expr.field or target)
        if isinstance(expr, PipeExpr):
            v = self.compile_expr(expr.source, target)
            for fn in expr.fns:
                v = self._pipe_fn(v, fn)
            return v
        if isinstance(expr, FmtExpr):
            args = [self.compile_expr(a).col for a in expr.args]
            return _Val(ofn.fmt(expr.template, *args))
        if isinstance(expr, MatchExpr):
            return self._match(expr)
        if isinstance(expr, ObjectExpr):
            fields = []
            for a in expr.statements:
                for tgt, v in zip(a.targets, self._expr_values(a.expr, a.targets)):
                    if tgt != "_":
                        fields.append(v.col.alias(tgt))
            return _Val(F.struct(*fields), "struct")
        if isinstance(expr, CollectExpr):
            acc = expr.accessor
            names: list[str] = []
            if acc.keys:
                for g in acc.keys:
                    hits = self.glob_fields(g)
                    names.extend(hits if hits else ([g] if "*" not in g else []))
            elif acc.options:
                names = list(acc.options)
            elif acc.field:
                names = [acc.field]
            cols = []
            for f in names:
                # DST-FIRST: collect sees previously-emitted TYPED outputs
                # before the raw source field (read.rs:47-48 "先从dst里查找,
                # 查找不到再到src查找"; collect_prm.rs test_collect_array
                # pins digit values for re-typed sport/dport)
                if f in self.outputs:
                    v = self.outputs[f]
                else:
                    v = self._input_take(f) if acc.kind == "take" else self._input_read(f)
                cols.append(v.col if v else F.lit(None))
            if not cols:
                arr = F.array().cast("array<string>")
            else:
                arr = F.array(*cols)
                try:  # Spark arrays are homogeneous; mixed types fall back
                    self.df.select(arr).schema  # noqa: B018 — coherence probe
                except Exception:
                    arr = F.array(*[c.cast("string") for c in cols])
            return _Val(F.filter(arr, lambda x: x.isNotNull()), "array")
        if isinstance(expr, SqlExpr):
            raise OmlCompileError("SQL enrichment is only valid as a top-level statement")
        if isinstance(expr, FunCall):
            # function-call expression in value position: apply to NULL source
            return self._pipe_fn(_Val(F.lit(None)), expr)
        raise OmlCompileError(f"cannot compile {expr!r}")

    def _accessor_one(self, acc: Accessor, field: str | None) -> _Val:
        v: _Val | None = None
        if acc.options:
            # first-present-wins over the option list (§1.3)
            cols = []
            kind = None
            for f in acc.options:
                got = self._input_take(f) if acc.kind == "take" else self._input_read(f)
                if got is not None:
                    cols.append(got.col)
                    kind = kind or got.kind
            if cols:
                v = _Val(F.coalesce(*cols) if len(cols) > 1 else cols[0], kind)
        elif field is not None:
            v = self._input_take(field) if acc.kind == "take" else self._input_read(field)
            if v is None and "/" in field:
                # json-path read (grammar json_path / read(/user/info/name)):
                # resolve the head field, then descend by the remaining path
                head, _, tail = field.partition("/")
                base = (
                    self._input_take(head)
                    if acc.kind == "take"
                    else self._input_read(head)
                )
                if base is not None:
                    v = _navigate(base, tail)
        if v is not None and acc.get_path:
            v = _navigate(v, acc.get_path)
        if v is None:
            if acc.default is not None:
                return self.compile_expr(acc.default)
            return _Val(F.lit(None).cast("string"))
        if acc.default is not None:
            dflt = self.compile_expr(acc.default)
            return _Val(F.coalesce(v.col, dflt.col), v.kind)
        return v

    def _builtin(self, name: str) -> Column:
        if name == "now::time":
            return ofn.now_time()
        if name == "now::date":
            return ofn.now_date()
        if name == "now::hour":
            return ofn.now_hour()
        raise OmlCompileError(f"unknown builtin {name}")

    # ----------------------------------------------------------------- match

    def _match(self, m: MatchExpr) -> _Val:
        srcs = [self.compile_expr(s) for s in m.sources]
        result: Column | None = None
        chain = []
        default: Column | None = None
        kind: str | None = None
        for arm in m.arms:
            rv = self.compile_expr(arm.result)
            res = rv.col
            kind = kind or rv.kind
            if arm.conds is None:
                default = res
                continue
            if len(arm.conds) != len(srcs):
                raise OmlCompileError("match arm arity != number of sources")
            pred = None
            for sv, cond in zip(srcs, arm.conds):
                c = self._cond(sv.col, cond)
                pred = c if pred is None else (pred & c)
            chain.append((pred, res))
        for pred, res in chain:
            result = F.when(pred, res) if result is None else result.when(pred, res)
        if result is None:
            return _Val(default if default is not None else F.lit(None), kind)
        if default is not None:
            result = result.otherwise(default)
        return _Val(result, kind)

    def _cond(self, col: Column, cond: MatchCond) -> Column:
        alt_preds = [self._cond_atom(col, a) for a in cond.alts]
        pred = alt_preds[0]
        for p in alt_preds[1:]:
            pred = pred | p
        pred = F.coalesce(pred, F.lit(False))  # missing field => no match
        return ~pred if cond.negate else pred

    def _cond_atom(self, col: Column, atom) -> Column:
        if isinstance(atom, Literal):
            lit = _typed_lit(atom)
            cast = _CAST.get(atom.dtype)
            lhs = col.try_cast(cast) if cast and cast != "string" else col.cast("string")
            if atom.dtype in ("chars", "symbol", "ip", "hex"):
                return lhs == lit
            return lhs == lit
        if isinstance(atom, RangeCond):
            if atom.lo.dtype == "ip":
                # match_prm.rs test_match_triple_source_with_mixed_cond:
                # `in (ip(10.0.0.1), ip(10.0.0.100))` is NUMERIC address
                # containment (compare_datafield orders IpAddr values) —
                # a string between() puts 10.0.0.50 above 10.0.0.100
                return ofn.ip4_to_int(col).between(
                    ofn.ip4_to_int(_typed_lit(atom.lo)),
                    ofn.ip4_to_int(_typed_lit(atom.hi)),
                )
            cast = _CAST.get(atom.lo.dtype, "string")
            lhs = col.try_cast(cast) if cast else col
            return lhs.between(_typed_lit(atom.lo), _typed_lit(atom.hi))
        if isinstance(atom, FunCall):
            # docs/usage/en/04-oml/functions/match_functions.md
            name = atom.name
            args = atom.args
            if name == "starts_with":
                return col.startswith(args[0])
            if name == "ends_with":
                return col.endswith(args[0])
            if name == "contains":
                return col.contains(args[0])
            if name == "regex_match":
                return col.rlike(args[0])
            if name == "has":
                return col.isNotNull()
            if name == "eq":
                # matchs.rs:419-425: eq is a NUMERIC comparison with
                # |a-b| < 1e-10 tolerance over extract_numeric (digit/
                # float/parseable chars — so eq(5.0) matches the string
                # "5"); a non-numeric arg warns and never matches
                try:
                    target = float(args[0])
                except (ValueError, IndexError):
                    return F.lit(False)
                return F.abs(col.try_cast("double") - F.lit(target)) < 1e-10
            if name == "iequals":
                return F.lower(col) == F.lit(args[0].lower())
            if name == "gt":
                return col.try_cast("double") > float(args[0])
            if name == "lt":
                return col.try_cast("double") < float(args[0])
            if name == "in_range":
                return col.try_cast("double").between(float(args[0]), float(args[1]))
            if name == "is_empty":
                return col.isNull() | (F.length(col.cast("string")) == 0)
            raise OmlCompileError(f"unknown match condition fn {name}")
        raise OmlCompileError(f"bad condition atom {atom!r}")

    # ------------------------------------------------------------------ pipes

    def _pipe_fn(self, v: _Val, fn: FunCall) -> _Val:
        c = v.col
        name = fn.name
        a = fn.args
        if name in ("time::to_ts", "to_ts"):
            return _Val(ofn.to_ts(c))
        if name in ("time::to_ts_ms", "to_ts_ms"):
            return _Val(ofn.to_ts_ms(c))
        if name in ("time::to_ts_us", "to_ts_us"):
            return _Val(ofn.to_ts_us(c))
        if name in ("time::to_ts_zone", "to_ts_zone"):
            zone = a[0] if a else "0"
            unit = (a[1] if len(a) > 1 else "s").lower()
            tz = zone if not re.fullmatch(r"[+-]?\d+", zone) else f"UTC{int(zone):+d}"
            unit_key = {"s": "sec", "sec": "sec", "ms": "ms", "us": "us"}.get(unit, "sec")
            return _Val(ofn.to_ts_zone(c, tz, unit_key))
        if name == "base64_encode":
            return _Val(ofn.base64_encode(c))
        if name == "base64_decode":
            return _Val(ofn.base64_decode(c, a[0] if a else "Utf8"))
        if name == "html_escape":
            return _Val(ofn.html_escape(c))
        if name == "html_unescape":
            return _Val(ofn.html_unescape(c))
        if name == "json_escape":
            return _Val(ofn.json_escape(c))
        if name == "json_unescape":
            return _Val(ofn.json_unescape(c))
        if name == "str_escape":
            return _Val(ofn.str_escape(c))
        if name == "str_unescape":
            return _Val(ofn.str_unescape(c))
        if name == "to_str":
            if v.kind in ("array", "struct", "map"):
                return _Val(F.to_json(c))
            return _Val(ofn.to_str(c))
        if name == "to_json":
            if v.kind in ("array", "struct", "map"):
                return _Val(ofn.to_json(c))
            return _Val(c.cast("string"))
        if name == "skip_empty":
            return _Val(
                ofn.skip_empty(c, dt=v.dtype, kind=v.kind), v.kind, v.dtype
            )
        if name == "nth":
            i = int(a[0]) if a else 0
            if v.kind == "array":
                return _Val(F.try_element_at(c, F.lit(i + 1)))
            # JSON string array
            return _Val(F.get_json_object(c.cast("string"), f"$[{i}]"))
        if name == "get":
            return _navigate(v, a[0])
        if name == "path":
            which = (a[0] if a else "name").lower()
            return _Val(ofn.path_name(c) if which == "name" else ofn.path_path(c))
        if name == "url":
            return _Val(ofn.url_part(c, a[0] if a else "host"))
        if name == "ip4_to_int":
            return _Val(ofn.ip4_to_int(c))
        if name == "starts_with":
            return _Val(ofn.starts_with_or_ignore(c, a[0]))
        if name == "map_to":
            # the constant is typed by the ARG (other.rs MapValue):
            # 200 -> digit, 1.5 -> float, true -> bool; QUOTED spellings
            # stay chars (map_to('200') emits the string "200"), and only
            # plain decimal shapes convert — 'Infinity'/'nan' never do
            raw_spelling = (fn.raw_args[0] if fn.raw_args else a[0]).strip()
            val: object = a[0]
            if not (raw_spelling[:1] in "'\""):
                if val in ("true", "false"):
                    val = val == "true"
                elif re.fullmatch(r"-?\d+", val):
                    val = int(val)
                elif re.fullmatch(r"-?\d+\.\d+", val):
                    val = float(val)
            return _Val(ofn.map_to(c, val))
        if name == "extract_main_word":
            return _Val(ofn.extract_main_word(c))
        if name == "extract_subject_object":
            return _Val(ofn.extract_subject_object(c), "struct")
        raise OmlCompileError(f"unknown pipe fn {fn.name}")

    # -------------------------------------------------------------------- SQL

    def _run_sql(self, a: Assign, q: SqlExpr) -> None:
        """`x = select c from tbl where k = read(f)` -> broadcast left join
        (SURVEY.md §2.8: the LRU query cache is replaced by the join)."""
        if self.knowdb is None:
            raise OmlCompileError("SQL enrichment requires a KnowDB instance")
        # named-parameter cap (sql.rs extract_more: match arms cover 0..=5
        # record-bound params, `_ => Vec::new()` with an error log — pinned
        # by test_max_params_query / test_too_many_params_query): a query
        # binding more than 5 record params returns EMPTY, so every target
        # stays NULL. Literals are inline SQL, not named params.
        n_params = sum(
            1
            for cond in q.conds
            if not isinstance(cond.param, (int, float, str, Literal))
        )
        if n_params > 5:
            for tgt, c in zip(a.targets, q.columns):
                if tgt != "_":
                    self._emit(tgt, _Val(F.lit(None)), a.dtype)
            return
        dim = self.knowdb.table(q.table)
        prefix = f"__kdb{self._sql_idx}_"
        self._sql_idx += 1
        dim_cols = {c for c in q.columns}
        eq_keys: list[str] = []
        conds = []
        for cond in q.conds:
            if cond.op == "between":
                lo, hi = cond.column.split(",")
                dim_cols.update([lo, hi])
            else:
                dim_cols.add(cond.column)
                if cond.op == "=":
                    eq_keys.append(cond.column)
        dimsel = dim.select([F.col(c).alias(prefix + c) for c in sorted(dim_cols)])
        if eq_keys:
            dimsel = dimsel.dropDuplicates([prefix + k for k in eq_keys])
        for cond in q.conds:
            param = self._sql_param(cond)
            if cond.op == "between":
                lo, hi = cond.column.split(",")
                conds.append(F.col(prefix + lo) <= param)
                conds.append(F.col(prefix + hi) >= param)
            else:
                ops = {
                    "=": lambda d, p: d == p,
                    "<=": lambda d, p: d <= p,
                    ">=": lambda d, p: d >= p,
                    "<": lambda d, p: d < p,
                    ">": lambda d, p: d > p,
                }
                conds.append(ops[cond.op](F.col(prefix + cond.column), param))
        jc = conds[0]
        for c in conds[1:]:
            jc = jc & c
        self.df = self.df.join(F.broadcast(dimsel), jc, "left")
        for tgt, c in zip(a.targets, q.columns):
            if tgt != "_":
                self._emit(tgt, _Val(F.col(prefix + c)), a.dtype)

    def _sql_param(self, cond) -> Column:
        p = cond.param
        if isinstance(p, (int, float)):
            col = F.lit(p)
        elif isinstance(p, str):
            col = F.lit(p)
        elif isinstance(p, Literal):
            col = _typed_lit(p)
        else:
            col = self.compile_expr(p).col
        if cond.ip4:
            col = ofn.ip4_to_int(col)
        return col

    # ------------------------------------------------------------------ final

    def finish(self) -> DataFrame:
        cols: list[Column] = []
        for name, v in self.outputs.items():
            if name in self.temps:
                continue  # __temp elision == column pruning
            cols.append(v.col.alias(name))
        if self.passthrough:
            for c in self.input_cols:
                if c in self.taken or c in self.outputs:
                    continue
                cols.append(F.col(c))
        if not cols:
            # empty-output model (dispatcher/oml.rs:83-98) — caller routes
            # this to the error sink; emit an error marker column
            return self.df.select(F.lit("oml_empty_output").alias("__err_kind"))
        return self.df.select(*cols)


# -------------------------------------------------------------------- privacy


def _privacy_mask(col, ptype: str):
    """Deterministic desensitization for the OML privacy section (grammar
    隐私段). The reference parses these declarations but ships no runtime
    masker; these masks follow the conventional CN-desensitization shapes
    for each declared type, keeping enough structure for joins/debugging:

    - privacy_ip / privacy_specify_ip : keep the /16, mask host (a.b.*.*)
    - privacy_mobile                  : 138****5678 (keep 3 + 4)
    - privacy_id_card                 : keep first 6 + last 4
    - privacy_mail                    : first char + ***@domain
    - privacy_domain / specify_domain : mask all but the last two labels
    - everything else (name/address/company/keymsg) : full mask ***

    All pure regexp/substring expressions — map-only. Non-matching values
    fall back to the full mask rather than leaking through.
    """
    s = col.cast("string")
    if ptype in ("privacy_ip", "privacy_specify_ip"):
        masked = F.regexp_replace(
            s, r"^(\d{1,3}\.\d{1,3})\.\d{1,3}\.\d{1,3}$", r"$1.*.*"
        )
        return F.when(s.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"), masked).otherwise(
            F.when(s.isNull(), s).otherwise(F.lit("***"))
        )
    if ptype == "privacy_mobile":
        ok = s.rlike(r"^1[0-9]{10}$")
        return F.when(
            ok, F.concat(F.substring(s, 1, 3), F.lit("****"), F.substring(s, 8, 4))
        ).otherwise(F.when(s.isNull(), s).otherwise(F.lit("***")))
    if ptype == "privacy_id_card":
        ok = s.rlike(r"^[0-9]{17}[0-9Xx]$")
        return F.when(
            ok, F.concat(F.substring(s, 1, 6), F.lit("********"), F.substring(s, 15, 4))
        ).otherwise(F.when(s.isNull(), s).otherwise(F.lit("***")))
    if ptype == "privacy_mail":
        ok = s.rlike(r"^[^@\s]+@[^@\s]+$")
        return F.when(
            ok,
            F.concat(
                F.substring(s, 1, 1), F.lit("***@"), F.substring_index(s, "@", -1)
            ),
        ).otherwise(F.when(s.isNull(), s).otherwise(F.lit("***")))
    if ptype in ("privacy_domain", "privacy_specify_domain"):
        ok = s.rlike(r"^[A-Za-z0-9.-]+\.[A-Za-z]{2,}$")
        return F.when(
            ok, F.concat(F.lit("*."), F.substring_index(s, ".", -2))
        ).otherwise(F.when(s.isNull(), s).otherwise(F.lit("***")))
    # privacy_specify_name / _address / _company / privacy_keymsg
    return F.when(s.isNull(), s).otherwise(F.lit("***"))


# --------------------------------------------------------------------- public


def compile_oml(text: str) -> OmlTransform:
    """Parse + compile one OML model."""
    return OmlTransform(parse_oml(text))


def compile_models(texts: list[str]) -> list[OmlTransform]:
    return [compile_oml(t) for t in texts]
