"""WPL pipe functions -> rule-match guard Columns.

Reference semantics (crates/wp-lang/src/eval/builtins/pipe_fun.rs:17-451,
SURVEY.md §2.3): a failing check makes the whole rule MISS — so pipes compile
into one conjunction predicate evaluated after extraction; rows failing it
are re-routed to the miss branch. `f_`-prefixed variants name the target
field; bare variants apply to the field the pipe is attached to.

Transform pipes (json_unescape/base64_decode/chars_replace) mutate the field
value instead; compile_transforms returns per-field replacement Columns.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F

from wp_motor_spark.wpl.ast import FunCall


def _parse_array(arg: str) -> list[str]:
    arg = arg.strip()
    if arg.startswith("["):
        try:
            return [str(x) for x in json.loads(arg.replace("'", '"'))]
        except json.JSONDecodeError:
            inner = arg[1:-1]
            return [s.strip().strip("\"'") for s in inner.split(",") if s.strip()]
    return [arg]


def _json_get(json_col: Column, json_map: bool, key: str) -> Column:
    """Address a key inside the rule's json field: the flattened
    remainder MAP (dtype json — keys are full '/' paths) or the raw
    object (exact_json) via JsonPath."""
    if json_map:
        return F.try_element_at(json_col, F.lit(key))
    return F.get_json_object(json_col, f"$.{key}")


def _json_has(json_col: Column, json_map: bool, key: str) -> Column:
    if json_map:
        # leaf path match, or the key is an object/array prefix of one
        return F.exists(
            F.map_keys(json_col),
            lambda k: (k == F.lit(key))
            | k.startswith(key + "/")
            | k.startswith(key + "["),
        )
    return F.array_contains(F.json_object_keys(json_col), key)


def _pipe_target(out) -> str:
    """Initial field a no-take pipe operates on. For json fields with
    declared subfields the reference's implicit target is the LAST
    extracted field (json.rs test_json_pipe_auto_last_behavior:
    `(json(chars@a, chars@b) | json_unescape())` mutates b), never the
    undeclared-key remainder map."""
    if getattr(out, "dtype", None) in ("json", "exact_json"):
        for sf in reversed(getattr(out, "subfields", None) or []):
            if sf.dtype == "_":
                continue
            ref = (sf.ref or "*").strip()
            if (
                sf.dtype == "json"
                and ref != "*"
                and not sf.name
                and getattr(sf, "subgroup", None) is None
            ):
                continue
            return sf.name or (ref if ref != "*" else out.name)
    return out.name


def _guard_expr(
    call: FunCall,
    active: Column,
    cols: dict[str, Column],
    json_col: Column | None = None,
    json_map: bool = False,
) -> Column | None:
    name = call.name
    a = call.args

    def fcol(key: str) -> Column:
        if key == "_":
            # normalize_target (function.rs:215): `_` = the ACTIVE field,
            # making f_chars_has(_, v) equivalent to chars_has(v)
            return active
        if key in cols:
            return cols[key]
        # the json field's undeclared keys live in its remainder map
        # (dtype json) or the raw object column (exact_json); f_* pipes
        # and take(key) selectors address INTO it (pipe_fun.rs guards run
        # on record fields; protocol/json.rs materializes keys)
        if json_col is not None:
            return _json_get(json_col, json_map, key)
        return F.lit(None)

    # NULL discipline (pipe_fun.rs): every guard is a NON-NULL boolean —
    # positive checks FAIL on a missing field (CharsHas/DigitRange
    # process(None) -> Err), the *_not_has family SUCCEEDS ("field
    # doesn't exist -> TRUE, permissive"). A nullable guard would leak
    # through the `when(~guard)` miss-rewrite as success.
    def t(expr: Column) -> Column:  # positive guard: NULL -> False
        return F.coalesce(expr, F.lit(False))

    if name == "not":
        inner = _guard_expr(call.inner, active, cols, json_col, json_map)
        return ~inner if inner is not None else None
    if name == "has":
        return active.isNotNull()
    if name == "f_has":
        if a[0] == "_":
            return active.isNotNull()
        if a[0] not in cols and json_col is not None:
            # key EXISTENCE in the json object (null-valued leaves are
            # dropped from the remainder map — see _flatten_json_udf)
            return F.coalesce(
                _json_has(json_col, json_map, a[0]), F.lit(False)
            )
        return fcol(a[0]).isNotNull()
    if name == "chars_has":
        return active.eqNullSafe(F.lit(a[0]))
    if name == "f_chars_has":
        return fcol(a[0]).eqNullSafe(F.lit(a[1]))
    if name == "chars_not_has":
        return ~active.eqNullSafe(F.lit(a[0]))
    if name == "f_chars_not_has":
        return ~fcol(a[0]).eqNullSafe(F.lit(a[1]))
    if name == "chars_in":
        return t(active.isin(_parse_array(a[0])))
    if name == "f_chars_in":
        return t(fcol(a[0]).isin(_parse_array(a[1])))
    # starts_with is NOT a guard (pipe_fun.rs StartsWith: a mismatching
    # or non-chars field becomes Ignore and process returns Ok — the
    # rule continues); it compiles as a transform in compile_transforms
    if name == "regex_match":
        return t(active.rlike(a[0]))
    # digit guards try_cast the operand: a no-op on real digit columns,
    # and ANSI-safe on string values addressed out of a json object
    if name == "digit_has":
        return active.try_cast("bigint").eqNullSafe(F.lit(int(a[0])))
    if name == "f_digit_has":
        return fcol(a[0]).try_cast("bigint").eqNullSafe(F.lit(int(a[1])))
    if name == "digit_in":
        return t(active.try_cast("bigint").isin([int(x) for x in _parse_array(a[0])]))
    if name == "f_digit_in":
        return t(fcol(a[0]).try_cast("bigint").isin([int(x) for x in _parse_array(a[1])]))
    if name == "digit_range":
        return t(active.try_cast("bigint").between(int(a[0]), int(a[1])))
    if name == "ip_in":
        return t(active.isin(_parse_array(a[0])))
    if name == "f_ip_in":
        return t(fcol(a[0]).isin(_parse_array(a[1])))
    return None  # selector / transform pipes are not guards


# WPL field dtypes whose runtime Value is NOT Chars (pipe_fun.rs match
# arms: ReplaceFunc/StartsWith only act on Value::Chars — digit/float/
# time/ip/bool values hit the non-chars branch)
_NON_CHARS_DTYPES = ("digit", "float", "port", "http/status", "bool")


def _is_non_chars(dtype: str | None) -> bool:
    return dtype is not None and (
        dtype in _NON_CHARS_DTYPES or dtype.startswith("time")
    )


def _transform_expr(call: FunCall, col: Column) -> Column:
    if call.name == "json_unescape":
        # undo JSON string escaping: \" \\ \n \t \r \/ — escaped backslashes
        # go through a sentinel first so `\\n` stays backslash + 'n' instead
        # of collapsing into a newline (same fix as oml/functions.py)
        from wp_motor_spark.oml.functions import json_unescape as _ju

        return _ju(col)
    if call.name == "base64_decode":
        return F.when(
            col.rlike(r"^[A-Za-z0-9+/\s]*={0,2}\s*$"),
            F.unbase64(F.regexp_replace(col, r"\s+", "")),
        ).cast("string")
    if call.name == "chars_replace":
        return F.replace(col, F.lit(call.args[0]), F.lit(call.args[1]))
    return col


def _select(call: FunCall, cols: dict[str, Column], current: str) -> str:
    """take(name)/last() field selectors (eval/runtime/field_pipe.rs):
    switch the ACTIVE field subsequent pipes operate on. `last` picks the
    most recently extracted field (insertion order of `cols`)."""
    if call.name == "take" and call.args:
        return call.args[0]
    if call.name == "last" and cols:
        return next(reversed(cols))
    return current


def compile_guards(outputs, cols: dict[str, Column]) -> Column | None:
    """AND together all guard pipes over extracted columns; None if no guards."""
    # first json/exact_json field, if any: f_*/take(key) guards address
    # into it when the key is not an extracted column (reference records
    # flatten parsed json keys into fields)
    json_col: Column | None = None
    json_map = False
    for out in outputs:
        if getattr(out, "dtype", None) in ("json", "exact_json") and out.name in cols:
            json_col = cols[out.name]
            json_map = getattr(out, "dtype", None) == "json"
            break
    dtypes = {out.name: getattr(out, "dtype", None) for out in outputs}
    guard: Column | None = None
    for out in outputs:
        active_name = _pipe_target(out)
        for call in out.pipes:
            if call.name in ("take", "last"):
                active_name = _select(call, cols, active_name)
                continue
            if active_name in cols:
                active = cols[active_name]
            elif json_col is not None:  # take(<json key>)
                active = _json_get(json_col, json_map, active_name)
            else:
                active = F.lit(None)
            g = _guard_expr(call, active, cols, json_col, json_map)
            # failing TRANSFORMS are rule misses in the reference
            # (pipe_fun.rs: Base64Decode/JsonUnescape/ReplaceFunc return
            # Err): an undecodable payload, an invalid JSON escape, or a
            # chars-only pipe on a non-chars field all fail the rule
            if g is None and call.name == "base64_decode":
                g = F.coalesce(
                    active.rlike(r"^[A-Za-z0-9+/\s]*={0,2}\s*$"), F.lit(False)
                )
            elif g is None and call.name == "json_unescape":
                # value_json_unescape (pipe_fun.rs:518-535): no backslash
                # at all short-circuits OK; otherwise serde parses
                # "\"{raw}\"" — so the validity check must be ANCHORED
                # with backslash pairs consumed atomically left-to-right.
                # The old scanning invalid-escape regex false-missed
                # 'a\\x' (escaped backslash then literal x, valid JSON)
                # by matching at the second backslash; Windows-path
                # payloads ('D:\\dir\\file', kv_chars1 fixture shape) hit
                # exactly that. serde also rejects unescaped '"' and raw
                # control chars inside the wrapped string.
                valid = active.rlike(
                    r'^(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})*$'
                )
                g = F.coalesce(
                    ~active.contains("\\") | valid, F.lit(False)
                )
            elif g is None and call.name == "chars_replace" and _is_non_chars(
                dtypes.get(active_name)
            ):
                g = F.lit(False)
            if g is not None:
                guard = g if guard is None else (guard & g)
    return guard


def compile_transforms(outputs, cols: dict[str, Column]) -> dict[str, Column]:
    """Per-field value replacements from transform pipes. take()/last()
    selectors retarget transforms too — `take(path) | json_unescape() |
    take(txt) | json_unescape()` (json.rs tests) mutates BOTH subfields."""
    dtypes = {out.name: getattr(out, "dtype", None) for out in outputs}
    repl: dict[str, Column] = {}
    for out in outputs:
        active_name = _pipe_target(out)
        for call in out.pipes:
            if call.name in ("take", "last"):
                active_name = _select(call, cols, active_name)
                continue
            if call.name in ("json_unescape", "base64_decode", "chars_replace"):
                base = repl.get(active_name, cols.get(active_name))
                if base is None:
                    continue
                repl[active_name] = _transform_expr(call, base)
            elif call.name == "starts_with":
                # pipe_fun.rs StartsWith: keep the value on a prefix
                # match, otherwise (or on a non-chars field) the field
                # becomes Ignore (NULL) — the rule does NOT miss
                base = repl.get(active_name, cols.get(active_name))
                if base is None:
                    continue
                if _is_non_chars(dtypes.get(active_name)):
                    repl[active_name] = F.lit(None).cast("string")
                else:
                    repl[active_name] = F.when(
                        base.startswith(call.args[0]), base
                    )
    return repl
