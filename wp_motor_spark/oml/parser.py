"""OML text -> AST. Hand-rolled recursive descent.

Grammar follows the reference's parser crate (crates/wp-oml/src/parser/;
worked example docs/usage/zh/04-oml/07-complete-example.md): a header
(`name : x`, `rule : pattern...`), `---`, then `;`-terminated statements.

Tokenizer notes: typed literal calls (`chars(v1.0.0)`, `ip(10.0.0.1)`,
`time(2025-12-29 12:00:00)`) are captured as single raw tokens so payload
spelling survives; `[...]` groups (option/keys lists, incl. one nesting
level for `details[*]/process_name`) are also single tokens.

Syntax accepted (superset of every in-tree fixture):
  targets [: type] = expr ;
  static { single-target literal assignments }
  expr := literal | accessor | @ref | symbol | Now::fn() | fmt(...)
        | match src { arms } | object { ... } | collect accessor
        | select ... from ... where ...        (KnowDB enrichment)
        | [pipe] expr | fn | fn ...
"""

from __future__ import annotations

import re

from wp_motor_spark.oml.ast import (
    Accessor,
    Assign,
    Builtin,
    CollectExpr,
    Expr,
    FieldRef,
    FmtExpr,
    FunCall,
    Literal,
    MatchArm,
    MatchCond,
    MatchExpr,
    ObjectExpr,
    OmlModel,
    PipeExpr,
    RangeCond,
    SqlCond,
    SqlExpr,
    SymbolRef,
)

LITERAL_TYPES = ("chars", "digit", "float", "bool", "ip", "time", "symbol", "hex")

# declarable target types (`x : T = ...`): the literal types plus the
# container/auto spellings seen across the reference fixtures (adm.oml
# `values : obj`, nginx.oml `: auto`, array/T)
_DECL_TYPES = set(LITERAL_TYPES) | {"array", "auto", "obj"}

_LIT_RE = re.compile(
    r"^(%s)\((.*)\)$" % "|".join(LITERAL_TYPES), re.DOTALL
)

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>//[^\n]*|\#[^\n]*)
    | (?P<litcall>(?:%s)\((?:[^()'"]|'[^']*'|"[^"]*")*\))
    | (?P<arrow>=>)
    | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<bracket>\[(?:[^\[\]]|\[[^\]]*\])*\])
    | (?P<ident>[A-Za-z_](?:\w|::|[./\-]|(?>\[\w*)(?!\])|\])*)
    | (?P<slashpath>/[A-Za-z_0-9][\w./\-]*)
    | (?P<dotted>\d+(?:\.\d+){2,})
    | (?P<number>-?\d+(?:\.\d+)?)
    | (?P<punct>[{}(),;:=|!@*<>_])
    """
    % "|".join(LITERAL_TYPES),
    re.VERBOSE,
)


class OmlParseError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out: list[str] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise OmlParseError(f"OML: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        out.append(m.group())
    return out


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise OmlParseError("OML: unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> str:
        t = self.next()
        if t != tok:
            ctx = self.toks[max(0, self.i - 4) : self.i + 3]
            raise OmlParseError(f"OML: expected {tok!r}, got {t!r} near {ctx}")
        return t

    def accept(self, tok: str) -> bool:
        if self.peek() == tok:
            self.i += 1
            return True
        return False


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] in "'\"" and s[-1] == s[0]:
        return re.sub(r"\\(.)", r"\1", s[1:-1])
    return s


def _is_litcall(tok: str | None) -> bool:
    return bool(tok and _LIT_RE.match(tok))


def _as_literal(tok: str) -> Literal:
    m = _LIT_RE.match(tok)
    assert m
    return Literal(dtype=m.group(1), value=_unquote(m.group(2)))


# --------------------------------------------------------------------- model


def parse_oml(text: str) -> OmlModel:
    """Parse one OML model file (header `name:`/`rule:` then `---` body)."""
    if "\n---" in text or text.startswith("---"):
        head_txt, _, body_txt = text.partition("---")
    else:
        head_txt, body_txt = "", text
    # optional third section (grammar 隐私段): `field : privacy_type` rows
    privacy: dict[str, str] = {}
    if "\n---" in body_txt:
        body_txt, _, priv_txt = body_txt.partition("\n---")
        for line in priv_txt.splitlines():
            line = line.strip()
            if not line or line.startswith(("//", "#", "-")):
                continue
            fld_name, _, ptype = line.partition(":")
            if fld_name.strip() and ptype.strip().startswith("privacy_"):
                privacy[fld_name.strip()] = ptype.strip()
    name = "model"
    enable = True
    patterns: list[str] = []
    for line in head_txt.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        if line.startswith("name"):
            name = line.split(":", 1)[1].strip()
        elif line.startswith("rule"):
            rest = line.split(":", 1)[1].strip()
            if rest:
                patterns.extend(x.strip() for x in rest.split(",") if x.strip())
        elif line.startswith("enable"):
            # `enable : true|false` (oml_conf.rs oml_conf_enable; default
            # true) — a disabled model is skipped at load, loading.rs:50
            enable = line.split(":", 1)[1].strip().lower() != "false"
        else:
            patterns.extend(x.strip() for x in line.split(",") if x.strip())
    p = _P(_tokenize(body_txt))
    statics: list[Assign] = []
    stmts: list[Assign] = []
    while p.peek() is not None:
        if p.peek() == "static" and p.peek(1) == "{":
            p.next()
            p.next()
            while not p.accept("}"):
                statics.append(_parse_assign(p))
            p.accept(";")
            continue
        stmts.append(_parse_assign(p))
    return OmlModel(
        name=name, rule_patterns=patterns, statics=statics, statements=stmts,
        privacy=privacy, enable=enable,
    )


# ----------------------------------------------------------------- statements


def _parse_target(p: _P) -> str:
    """One assignment target; glob targets (`alert*`, `*_log`) tokenize
    as ident/'*' pairs and are merged back (grammar 目标通配)."""
    t = p.next()
    while True:
        nxt = p.peek()
        if nxt == "*":
            t += p.next()
        elif t.endswith("*") and nxt and re.match(r"^[A-Za-z_]\w*$", nxt):
            t += p.next()
        elif nxt and nxt.startswith("/"):
            # path-segmented glob targets: '*/path', 'A*/path', '*/name'
            # (test_case.rs test_wild_get) — a '/'-leading token after a
            # target can only continue it (the array/T dtype slash sits
            # AFTER the ':' and is handled there)
            t += p.next()
        else:
            return t


def _parse_assign(p: _P) -> Assign:
    targets = [_parse_target(p)]
    while p.accept(","):
        targets.append(_parse_target(p))
    dtype = None
    if p.accept(":"):
        dtype = p.next()
        if p.peek() == "/":  # array/T spelled with tokens
            p.next()
            dtype += "/" + p.next()
        base, _, sub = dtype.partition("/")
        if base not in _DECL_TYPES or (sub and sub not in _DECL_TYPES):
            # oml_err.rs test_report_err pins this: `version :chrs = ...`
            # must be a PARSE error naming the bad type, not a silent
            # no-cast passthrough
            raise OmlParseError(f"OML: unknown declared type {dtype!r}")
    p.expect("=")
    expr = _parse_expr(p, target=targets[0])
    p.expect(";")
    return Assign(targets=targets, dtype=dtype, expr=expr)


# ---------------------------------------------------------------- expressions


def _parse_expr(p: _P, target: str | None = None) -> Expr:
    tok = p.peek()
    if tok == "pipe":
        p.next()
        return _with_pipes(p, _parse_primary(p, target))
    if tok == "match":
        p.next()
        return _parse_match(p)
    if tok == "select":
        return _parse_sql(p)
    return _with_pipes(p, _parse_primary(p, target))


def _with_pipes(p: _P, source: Expr) -> Expr:
    fns: list[FunCall] = []
    while p.accept("|"):
        fns.append(_parse_funcall(p))
    if not fns:
        return source
    return PipeExpr(source=source, fns=fns)


def _parse_primary(p: _P, target: str | None = None) -> Expr:
    tok = p.peek()
    if tok is None:
        raise OmlParseError("OML: expected expression")
    if _is_litcall(tok):
        return _as_literal(p.next())
    if tok == "@":
        p.next()
        return FieldRef(name=p.next())
    if tok == "object" and p.peek(1) == "{":
        p.next()
        p.next()
        stmts = []
        while not p.accept("}"):
            stmts.append(_parse_assign(p))
        return ObjectExpr(statements=stmts)
    if tok == "collect":
        p.next()
        acc = _parse_primary(p, target)
        if not isinstance(acc, Accessor):
            raise OmlParseError("OML: collect requires read()/take()")
        return CollectExpr(accessor=acc)
    if tok == "fmt" and p.peek(1) == "(":
        p.next()
        p.next()
        template = _unquote(p.next())
        args: list[Expr] = []
        while p.accept(","):
            args.append(_parse_expr(p))
        p.expect(")")
        return FmtExpr(template=template, args=args)
    if tok in ("read", "take") and p.peek(1) == "(":
        return _parse_accessor(p)
    if tok.lower().startswith("now::"):
        p.next()
        p.expect("(")
        p.expect(")")
        return Builtin(name=tok.lower())
    if re.match(r"^[A-Za-z_]", tok):
        p.next()
        if p.peek() == "(":
            if tok.lower() in LITERAL_TYPES:
                # typed literal with whitespace before the paren —
                # `ip ( 127.10.10.10 )` (oml_aggregate.rs test_oml_take);
                # the single-token litcall regex only covers `ip(...)`
                return Literal(dtype=tok.lower(), value=_unquote(_raw_paren(p)))
            return FunCall(name=tok.lower(), args=_split_args(_raw_paren(p)))
        return SymbolRef(name=tok)
    raise OmlParseError(f"OML: unexpected token {tok!r}")


def _raw_paren(p: _P) -> str:
    """Consume a balanced (...) group token-wise; strings stay atomic so
    parens inside quotes are safe."""
    p.expect("(")
    depth = 1
    parts: list[str] = []
    while depth > 0:
        t = p.next()
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
            if depth == 0:
                break
        parts.append(t)
    return " ".join(parts)


def _split_args(raw: str) -> list[str]:
    if not raw.strip():
        return []
    return [_unquote(a) for a in raw.split(",")]


def _parse_funcall(p: _P) -> FunCall:
    name = p.next()
    if _is_litcall(name):  # e.g. `| hex(...)`? keep literal spelling
        lit = _as_literal(name)
        return FunCall(name=lit.dtype, args=[lit.value])
    args: list[str] = []
    raw_args: list[str] = []
    if p.peek() == "(":
        raw = _raw_paren(p)
        raw_args = [a.strip() for a in raw.split(",")] if raw.strip() else []
        args = [_unquote(a) for a in raw_args]
    return FunCall(name=name.lower(), args=args, raw_args=raw_args)


def _split_bracket(tok: str) -> list[str]:
    inner = tok[1:-1].strip()
    if not inner:
        return []
    return [x.strip() for x in inner.split(",") if x.strip()]


def _parse_accessor(p: _P) -> Accessor:
    kind = p.next()  # read | take
    p.expect("(")
    acc = Accessor(kind=kind)
    tok = p.peek()
    if tok == ")":
        p.next()
    elif tok in ("option", "keys", "in") and (
        p.peek(1) == ":" or (p.peek(1) or "").startswith("[")
    ):
        # only the LIST form is the keyword (option:[...] / keys:[...] /
        # in:[...]) — a bare read(in) still reads a field named "in"
        p.next()
        p.accept(":")
        b = p.next()
        if not (b.startswith("[") and b.endswith("]")):
            raise OmlParseError(f"OML: expected [...] after {tok}, got {b!r}")
        names = _split_bracket(b)
        if tok == "option":
            acc.options = names
        else:  # grammar: ("in"|"keys") are synonyms
            acc.keys = names
        p.expect(")")
    else:
        # field name or /json/path (leading slash = path into the record,
        # take_json_path); `, get : key` navigates into the value
        acc.field = p.next().lstrip("/")
        if p.accept(","):
            p.expect("get")
            p.expect(":")
            acc.get_path = p.next()
        p.expect(")")
    # default clause { _ : expr }
    if p.peek() == "{" and p.peek(1) == "_":
        p.next()
        p.next()
        p.expect(":")
        acc.default = _parse_expr(p)
        p.expect("}")
    return acc


# --------------------------------------------------------------------- match


def _parse_match(p: _P) -> MatchExpr:
    sources: list[Expr] = []
    if p.peek() == "(":
        p.next()
        sources.append(_parse_expr(p))
        while p.accept(","):
            sources.append(_parse_expr(p))
        p.expect(")")
    else:
        sources.append(_parse_primary(p))
    p.expect("{")
    arms: list[MatchArm] = []
    while not p.accept("}"):
        arms.append(_parse_arm(p, n_sources=len(sources)))
    return MatchExpr(sources=sources, arms=arms)


def _parse_arm(p: _P, n_sources: int) -> MatchArm:
    if p.peek() == "_":
        p.next()
        p.expect("=>")
        result = _parse_expr(p)
        _arm_terminator(p)
        return MatchArm(conds=None, result=result)
    conds: list[MatchCond]
    if n_sources > 1 and p.peek() == "(":
        p.next()
        conds = [_parse_cond(p)]
        while p.accept(","):
            conds.append(_parse_cond(p))
        p.expect(")")
    else:
        conds = [_parse_cond(p)]
    p.expect("=>")
    result = _parse_expr(p)
    _arm_terminator(p)
    return MatchArm(conds=conds, result=result)


def _arm_terminator(p: _P) -> None:
    """match arms end with ',' or ';' or nothing — the reference accepts
    opt(comma) then opt(semicolon) (match_prm.rs match_calc_target)."""
    p.accept(",")
    p.accept(";")


def _parse_cond(p: _P) -> MatchCond:
    negate = p.accept("!")
    alts: list[object] = [_parse_cond_atom(p)]
    while p.accept("|"):
        alts.append(_parse_cond_atom(p))
    return MatchCond(alts=alts, negate=negate)


def _parse_cond_atom(p: _P):
    tok = p.peek()
    if tok == "in":
        p.next()
        p.expect("(")
        lo = _parse_primary(p)
        p.expect(",")
        hi = _parse_primary(p)
        p.expect(")")
        if not (isinstance(lo, Literal) and isinstance(hi, Literal)):
            raise OmlParseError("OML: in(...) bounds must be literals")
        return RangeCond(lo=lo, hi=hi)
    prim = _parse_primary(p)
    if isinstance(prim, (Literal, FunCall)):
        return prim
    if isinstance(prim, SymbolRef):
        return Literal(dtype="chars", value=prim.name)
    raise OmlParseError(f"OML: bad match condition {prim!r}")


# ----------------------------------------------------------------------- SQL


_SQL_IDENT_RE = re.compile(r"^[A-Za-z0-9_.]+$")


def _parse_sql(p: _P) -> SqlExpr:
    p.expect("select")
    cols = [p.next()]
    while p.accept(","):
        cols.append(p.next())
    p.expect("from")
    table = p.next()
    # strict mode (default ON; OML_SQL_STRICT=0 disables — grammar SQL
    # 严格模式): whitelist columns ('*' or [A-Za-z0-9_.]+) and the single
    # table name; joins/subqueries/functions fail to parse upstream of
    # KnowDB so misuse is caught at model load, not at run time.
    import os

    if os.environ.get("OML_SQL_STRICT", "1") != "0":
        bad = [c for c in cols if c != "*" and not _SQL_IDENT_RE.match(c)]
        if bad:
            raise OmlParseError(f"OML SQL strict mode: bad column(s) {bad}")
        if not _SQL_IDENT_RE.match(table):
            raise OmlParseError(f"OML SQL strict mode: bad table {table!r}")
    conds: list[SqlCond] = []
    if p.peek() == "where":
        p.next()
        conds.append(_parse_sql_cond(p))
        while p.peek() == "and":
            p.next()
            conds.append(_parse_sql_cond(p))
    return SqlExpr(columns=cols, table=table, conds=conds)


def _parse_sql_cond(p: _P) -> SqlCond:
    tok = p.next()
    if tok == "ip4_between" and p.peek() == "(":
        # sugar (sql_prm.rs:196-201): ip4_between(param, lo, hi) expands to
        # lo <= ip4_int(param) AND hi >= ip4_int(param)
        p.expect("(")
        param = _parse_expr(p)
        p.expect(",")
        lo = p.next()
        p.expect(",")
        hi = p.next()
        p.expect(")")
        return SqlCond(column=f"{lo},{hi}", op="between", param=param, ip4=True)
    column = tok
    op = p.next()
    if op in ("<", ">") and p.peek() == "=":
        p.next()
        op += "="
    t = p.peek()
    if t in ("read", "take") and p.peek(1) == "(":
        return SqlCond(column=column, op=op, param=_parse_accessor(p))
    if t == "ip4_int" and p.peek(1) == "(":
        p.next()
        p.expect("(")
        inner = _parse_expr(p)
        p.expect(")")
        return SqlCond(column=column, op=op, param=inner, ip4=True)
    if (t or "").lower().startswith("now::"):
        p.next()
        p.expect("(")
        p.expect(")")
        return SqlCond(column=column, op=op, param=Builtin(name=t.lower()))
    if _is_litcall(t):
        return SqlCond(column=column, op=op, param=_as_literal(p.next()))
    raw = p.next()
    val: object = _unquote(raw)
    if re.fullmatch(r"-?\d+", raw):
        val = int(raw)
    elif re.fullmatch(r"-?\d+\.\d+", raw):
        val = float(raw)
    return SqlCond(column=column, op=op, param=val)
