"""WPL text -> AST (recursive descent).

Grammar: docs/usage/en/03-wpl/06-grammar-reference.md in the reference repo
(EBNF reproduced there; authoritative impl crates/wp-lang/src/parser/).
Supports: package/rule decls, annotations (tag/copy_raw), preprocessors,
groups (seq/alt/opt/some_of/not), fields with repeat/symbol-content/
subfields/name/length/format(scope+quote)/shortcut+pattern separators/pipes.
"""

from __future__ import annotations

import re

from wp_motor_spark.wpl.ast import FunCall, WplField, WplGroup, WplRule, WplSubfield

_TYPE_ALIASES = {
    "time/apache": "time/clf",
    "time/httpd": "time/clf",
    "time/nginx": "time/clf",
    "time/rfc3339": "time_3339",
    "time/rfc2822": "time_2822",
    "time/timestamp": "time_timestamp",
    "time/epoch": "time_timestamp",
    "http/user_agent": "http/agent",
    "proto/text": "proto_text",
}

# The reference's parser factory resolves a field type NAME to a parser
# at parse time and fails on an unknown one (err_report.rs test_err_2:
# `(px,...)` is a parse error, not a chars fallback). Kept in sync with
# the compiler's pattern/type tables; tests/test_wpl_parse.py compiles
# every member to catch drift.
_KNOWN_TYPES = {
    "chars", "digit", "float", "port", "bool", "hex", "sn", "auto", "_",
    "symbol", "peek_symbol", "ip", "ip_net", "domain", "email", "url",
    "id_card", "mobile_phone", "kv", "kvarr", "json", "exact_json",
    "base64", "proto_text", "array",
    "time", "time_iso", "time_3339", "time_2822", "time_timestamp",
    "time/clf",
    "http/request", "http/status", "http/method", "http/agent",
}


def _check_dtype(dtype: str, pos: int) -> str:
    if dtype in _KNOWN_TYPES:
        return dtype
    if dtype.startswith("array/") and dtype.split("/", 1)[1] in _KNOWN_TYPES:
        return dtype
    raise WplSyntaxError(f"unknown field type {dtype!r} at {pos}")


_KEY_RE = re.compile(r"[A-Za-z0-9_./-]+")
_NAME_RE = re.compile(r"[A-Za-z0-9_.\-]+")
# subfield names: take_key (utils.rs:45) — adds '/' to the var charset
_SUBNAME_RE = re.compile(r"[A-Za-z0-9_./\-]+")
_NUM_RE = re.compile(r"\d+")


class WplSyntaxError(ValueError):
    pass


class _Cursor:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.text)

    def peek(self, n: int = 1) -> str:
        return self.text[self.pos : self.pos + n]

    def skip_ws(self) -> None:
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch in " \t\r\n":
                self.pos += 1
            elif self.text.startswith("//", self.pos):
                nl = self.text.find("\n", self.pos)
                self.pos = len(self.text) if nl < 0 else nl + 1
            else:
                break

    def expect(self, tok: str) -> None:
        self.skip_ws()
        if not self.text.startswith(tok, self.pos):
            raise WplSyntaxError(
                f"expected {tok!r} at {self.pos}: ...{self.text[self.pos:self.pos+40]!r}"
            )
        self.pos += len(tok)

    def try_tok(self, tok: str) -> bool:
        self.skip_ws()
        if self.text.startswith(tok, self.pos):
            self.pos += len(tok)
            return True
        return False

    def match_re(self, rx: re.Pattern) -> str | None:
        self.skip_ws()
        m = rx.match(self.text, self.pos)
        if m:
            self.pos = m.end()
            return m.group(0)
        return None


def parse_wpl(text: str) -> list[WplRule]:
    """Parse a WPL document (packages and/or bare rules) into rules."""
    cur = _Cursor(text)
    rules: list[WplRule] = []
    while True:
        cur.skip_ws()
        if cur.eof():
            break
        anno = _parse_annotation(cur)
        cur.skip_ws()
        if cur.text.startswith("package", cur.pos):
            cur.expect("package")
            pkg = cur.match_re(_KEY_RE)
            cur.expect("{")
            while True:
                cur.skip_ws()
                if cur.try_tok("}"):
                    break
                r_anno = _parse_annotation(cur)
                rule = _parse_rule(cur)
                rule.package = pkg
                _apply_anno(rule, anno)
                _apply_anno(rule, r_anno)
                rules.append(rule)
        elif cur.text.startswith("rule", cur.pos):
            rule = _parse_rule(cur)
            _apply_anno(rule, anno)
            rules.append(rule)
        else:
            raise WplSyntaxError(
                f"expected package/rule at {cur.pos}: {cur.text[cur.pos:cur.pos+40]!r}"
            )
    return rules


def _apply_anno(rule: WplRule, anno: dict) -> None:
    if not anno:
        return
    rule.tags.update(anno.get("tags", {}))
    if anno.get("copy_raw"):
        rule.copy_raw = anno["copy_raw"]


def _parse_annotation(cur: _Cursor) -> dict:
    """#[tag(k:"v",...), copy_raw(name:"x")]"""
    out: dict = {}
    cur.skip_ws()
    if not cur.text.startswith("#[", cur.pos):
        return out
    cur.pos += 2
    while True:
        cur.skip_ws()
        if cur.try_tok("]"):
            break
        cur.try_tok(",")
        cur.skip_ws()
        if cur.text.startswith("tag", cur.pos):
            cur.expect("tag")
            cur.expect("(")
            tags = {}
            while not cur.try_tok(")"):
                cur.try_tok(",")
                k = cur.match_re(_NAME_RE)
                cur.expect(":")
                v = _parse_string(cur)
                tags[k] = v
            out.setdefault("tags", {}).update(tags)
        elif cur.text.startswith("copy_raw", cur.pos):
            # copy_raw(KEY:"value") parses with ANY key (wpl_anno.rs
            # take_tag_kv); only key == "name" activates the raw copy —
            # other keys are accepted no-ops (ann_func.rs:104-110,
            # parse_code.rs test_package_annotation1 uses hello:"ll")
            cur.expect("copy_raw")
            cur.expect("(")
            cur.skip_ws()
            key = cur.match_re(_NAME_RE)
            cur.expect(":")
            val = _parse_string(cur)
            cur.skip_ws()
            cur.expect(")")
            if key == "name":
                out["copy_raw"] = val
        else:
            raise WplSyntaxError(f"unknown annotation at {cur.pos}")
    return out


def _parse_string(cur: _Cursor) -> str:
    cur.skip_ws()
    if cur.peek() == '"':
        cur.pos += 1
        out = []
        while not cur.eof():
            ch = cur.text[cur.pos]
            if ch == "\\" and cur.pos + 1 < len(cur.text):
                nxt = cur.text[cur.pos + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                cur.pos += 2
            elif ch == '"':
                cur.pos += 1
                return "".join(out)
            else:
                out.append(ch)
                cur.pos += 1
        raise WplSyntaxError("unterminated string")
    # raw string r#"..."#
    if cur.text.startswith('r#"', cur.pos):
        end = cur.text.find('"#', cur.pos + 3)
        if end < 0:
            raise WplSyntaxError("unterminated raw string")
        s = cur.text[cur.pos + 3 : end]
        cur.pos = end + 2
        return s
    raise WplSyntaxError(f"expected string at {cur.pos}")


def _parse_rule(cur: _Cursor) -> WplRule:
    cur.expect("rule")
    name = cur.match_re(re.compile(r"[A-Za-z0-9_./\-.]+"))
    if not name:
        raise WplSyntaxError(f"rule name expected at {cur.pos}")
    cur.expect("{")
    rule = WplRule(name=name)
    cur.skip_ws()
    # plg_pipe block (grammar: statement = plg_pipe_block | express;
    # ["@"]? "plg_pipe" "(" "id" ":" key ")" "{" express "}") — the named
    # plugin preprocessor wraps the whole express
    plg_block = False
    if re.match(r"@?plg_pipe\s*\(", cur.text[cur.pos :]):
        if cur.peek() == "@":
            cur.pos += 1
        cur.expect("plg_pipe")
        cur.expect("(")
        cur.expect("id")
        cur.expect(":")
        key = cur.match_re(re.compile(r"[A-Za-z0-9_./\-]+"))
        if not key:
            raise WplSyntaxError(f"plg_pipe id expected at {cur.pos}")
        cur.expect(")")
        cur.expect("{")
        rule.preprocs.append(f"plg_pipe/{key}")
        plg_block = True
        cur.skip_ws()
    # optional preproc chain: |decode/base64|... or shorthand |base64|
    if cur.peek() == "|":
        cur.pos += 1
        while True:
            # plugin names carry hyphens/dots (vm_unit.rs
            # preorder_plg_pipe_unit_executes registers
            # "plg_pipe/MOCK-STAGE")
            step = cur.match_re(re.compile(r"[A-Za-z0-9_/.\-]+"))
            if not step:
                raise WplSyntaxError(f"preproc step expected at {cur.pos}")
            rule.preprocs.append(_normalize_preproc(step))
            cur.expect("|")
            cur.skip_ws()
            if cur.peek() in "(a" or not _looks_like_preproc(cur):
                break
    # comma-joined groups
    while True:
        grp = _parse_group(cur)
        rule.groups.append(grp)
        if not cur.try_tok(","):
            break
        cur.skip_ws()
        if cur.peek() == "}":
            break
    if plg_block:
        cur.expect("}")  # close the plg_pipe block
        cur.skip_ws()
    cur.expect("}")
    return rule


def _looks_like_preproc(cur: _Cursor) -> bool:
    m = re.match(r"[A-Za-z0-9_/]+\|", cur.text[cur.pos :])
    return bool(m)


def _normalize_preproc(step: str) -> str:
    shorthands = {
        "base64": "decode/base64",
        "hex": "decode/hex",
        "unescape": "unquote/unescape",
        "bom": "strip/bom",
    }
    return shorthands.get(step, step)


_GROUP_METAS = ("alt", "opt", "some_of", "seq", "not")


def _parse_group(cur: _Cursor) -> WplGroup:
    cur.skip_ws()
    meta = "seq"
    for gm in _GROUP_METAS:
        if cur.text.startswith(gm + "(", cur.pos) or re.match(
            rf"{gm}\s*\(", cur.text[cur.pos :]
        ):
            meta = gm
            cur.pos += len(gm)
            break
    cur.expect("(")
    grp = WplGroup(meta=meta)
    while True:
        cur.skip_ws()
        if cur.try_tok(")"):
            break
        if cur.try_tok(","):
            continue
        item = _parse_field_or_group(cur)
        grp.items.append(item)
    # optional group length [n] — rare; parse and ignore content semantics
    cur.skip_ws()
    if cur.peek() == "[":
        m = re.match(r"\[(\d+)\]", cur.text[cur.pos :])
        if m:
            cur.pos += m.end()
    # optional group separator
    sep, pat = _try_parse_sep(cur)
    grp.sep, grp.pattern_sep = sep, pat
    return grp


def _parse_field_or_group(cur: _Cursor):
    cur.skip_ws()
    # nested group?
    for gm in _GROUP_METAS:
        if re.match(rf"{gm}\s*\(", cur.text[cur.pos :]):
            return _parse_group(cur)
    if cur.peek() == "(":
        return _parse_group(cur)
    return _parse_field(cur)


_FIELD_TYPE_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(?:/[A-Za-z0-9_]+)?|_")


def _parse_field(cur: _Cursor) -> WplField:
    cur.skip_ws()
    repeat: int | None = 1
    m = re.match(r"(\d*)\*", cur.text[cur.pos :])
    if m:
        repeat = int(m.group(1)) if m.group(1) else None
        cur.pos += m.end()
        cur.skip_ws()
    dtype = cur.match_re(_FIELD_TYPE_RE)
    if not dtype:
        raise WplSyntaxError(f"field type expected at {cur.pos}: {cur.peek(30)!r}")
    dtype = _check_dtype(_TYPE_ALIASES.get(dtype, dtype), cur.pos)
    fld = WplField(dtype=dtype, repeat=repeat)
    # symbol content (only symbol/peek_symbol)
    if dtype in ("symbol", "peek_symbol"):
        cur.expect("(")
        out = []
        while not cur.eof():
            ch = cur.text[cur.pos]
            if ch == "\\" and cur.pos + 1 < len(cur.text):
                out.append(cur.text[cur.pos + 1])
                cur.pos += 2
            elif ch == ")":
                cur.pos += 1
                break
            else:
                out.append(ch)
                cur.pos += 1
        fld.symbol = "".join(out)
    # subfields for composite types
    elif cur.peek() == "(" and dtype in ("json", "exact_json", "kvarr", "kv", "obj", "array", "base64"):
        fld.subfields = _parse_subfields(cur)
    # array subtype
    if dtype == "array" and cur.peek() == "/":
        cur.pos += 1
        sub = cur.match_re(re.compile(r"[A-Za-z_][A-Za-z0-9_]*"))
        fld.dtype = f"array/{sub}"
    # format may sit BEFORE the name too (`chars":quoted_str`,
    # `time/clf<[,]>:time_clf` — 07-complete-types-example.md), in
    # addition to the post-name position (`time:recv_time<[,]>`)
    if cur.peek() == "<":
        end = _find_scope_end(cur.text, cur.pos)
        fld.fmt = _split_scope(cur.text[cur.pos + 1 : end])
        cur.pos = end + 1
    elif cur.peek() == '"' and re.match(
        r'"\s*:', cur.text[cur.pos :]
    ):  # quote directly followed by :name (a bare trailing quote still
        # belongs to the post-name branch below)
        fld.fmt = ('"', '"')
        cur.pos += 1
    # :name
    if cur.try_tok(":"):
        fld.name = cur.match_re(_NAME_RE)
    # [length]
    cur.skip_ws()
    if cur.peek() == "[":
        m = re.match(r"\[(\d+)\]", cur.text[cur.pos :])
        if m:
            fld.length = int(m.group(1))
            cur.pos += m.end()
    # format: scope <b,e> or quote " (post-name position; skipped when the
    # pre-name position above already set it)
    cur.skip_ws()
    if fld.fmt is not None:
        pass
    elif cur.peek() == "<":
        # scope fmt: <beg,end> where beg/end are arbitrary char runs
        end = _find_scope_end(cur.text, cur.pos)
        inner = cur.text[cur.pos + 1 : end]
        comma = _split_scope(inner)
        fld.fmt = comma
        cur.pos = end + 1
    elif cur.peek() == '"':
        fld.fmt = ('"', '"')
        cur.pos += 1
    # separator
    sep, pat = _try_parse_sep(cur)
    fld.sep, fld.pattern_sep = sep, pat
    # pipes, or decode-then-subparse `base64 | (chars:x)`
    while True:
        save = cur.pos
        cur.skip_ws()
        if cur.peek() == "|":
            cur.pos += 1
            cur.skip_ws()
            if cur.peek() == "(":
                fld.subgroup = _parse_group(cur)
            else:
                fld.pipes.append(_parse_fun_call(cur))
        else:
            cur.pos = save
            break
    return fld


def _find_scope_end(text: str, start: int) -> int:
    """Find the '>' closing a scope fmt starting at '<'."""
    i = start + 1
    while i < len(text):
        if text[i] == "\\":
            i += 2
            continue
        if text[i] == ">":
            # handle <<,>> : prefer the LAST '>' in a run
            j = i
            while j + 1 < len(text) and text[j + 1] == ">":
                j += 1
            return j
        i += 1
    raise WplSyntaxError("unterminated scope format")


def _split_scope(inner: str) -> tuple[str, str]:
    """Split '<beg,end>' inner content on the separating comma."""
    # e.g. '[,]' -> ('[', ']');  '<,>' -> ('<', '>')
    mid = len(inner) // 2
    if inner[mid] == ",":
        return inner[:mid], inner[mid + 1 :]
    idx = inner.find(",")
    if idx < 0:
        raise WplSyntaxError(f"bad scope format {inner!r}")
    return inner[:idx], inner[idx + 1 :]


def _try_parse_sep(cur: _Cursor) -> tuple[str | None, str | None]:
    """Parse shortcut (\\x escapes) or pattern ({...}) separator if present."""
    save = cur.pos
    if cur.peek() == "\\":
        chars = []
        while cur.peek() == "\\" and cur.pos + 1 < len(cur.text):
            chars.append(cur.text[cur.pos + 1])
            cur.pos += 2
        return "".join(chars), None
    if cur.peek() == "{":
        depth = 0
        i = cur.pos
        while i < len(cur.text):
            ch = cur.text[i]
            if ch == "\\":
                i += 2
                continue
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    content = cur.text[cur.pos + 1 : i]
                    cur.pos = i + 1
                    return None, content
            i += 1
        cur.pos = save
    return None, None


def _parse_subfields(cur: _Cursor) -> list[WplSubfield]:
    cur.expect("(")
    subs: list[WplSubfield] = []
    while True:
        cur.skip_ws()
        if cur.try_tok(")"):
            if not subs:
                # err_report.rs test_err_5: `json()` is a parse error —
                # an empty declaration list is never what the author meant
                raise WplSyntaxError(f"empty subfield list at {cur.pos}")
            break
        if cur.try_tok(","):
            continue
        start = cur.pos
        sf = WplSubfield()
        if re.match(r"opt\s*\(", cur.text[cur.pos :]):
            cur.expect("opt")
            cur.expect("(")
            sf.optional = True
            sf.dtype = cur.match_re(_FIELD_TYPE_RE) or "auto"
            if sf.dtype != "auto":
                sf.dtype = _check_dtype(
                    _TYPE_ALIASES.get(sf.dtype, sf.dtype), cur.pos
                )
            cur.expect(")")
        else:
            dt = cur.match_re(_FIELD_TYPE_RE)
            sf.dtype = (
                _check_dtype(_TYPE_ALIASES.get(dt, dt), cur.pos) if dt else "auto"
            )
        if sf.dtype in ("symbol", "peek_symbol") and cur.peek() == "(":
            # symbol content args (wpl_id_field: take_parentheses for
            # DataType::Symbol — json(symbol(boy2)@key) is an equality
            # guard on the extracted value)
            cur.pos += 1
            buf = []
            while not cur.eof():
                ch = cur.text[cur.pos]
                if ch == "\\" and cur.pos + 1 < len(cur.text):
                    buf.append(cur.text[cur.pos + 1])
                    cur.pos += 2
                elif ch == ")":
                    cur.pos += 1
                    break
                else:
                    buf.append(ch)
                    cur.pos += 1
            sf.symbol = "".join(buf)
        if cur.peek() == '"' and cur.text[cur.pos : cur.pos + 2] == '"@':
            # quote fmt directly after the type (chars"@msg:alias)
            sf.fmt = '"'
            cur.pos += 1
        if cur.try_tok("@"):
            if cur.peek() == "'":
                # single-quoted ref for special field names
                # (field_reference.md: @'@client-ip', @'event.type');
                # raw string, only \' escapes the closing quote
                cur.pos += 1
                buf = []
                while not cur.eof():
                    ch = cur.text[cur.pos]
                    if (
                        ch == "\\"
                        and cur.pos + 1 < len(cur.text)
                        and cur.text[cur.pos + 1] == "'"
                    ):
                        buf.append("'")
                        cur.pos += 2
                    elif ch == "'":
                        cur.pos += 1
                        break
                    else:
                        buf.append(ch)
                        cur.pos += 1
                else:
                    raise WplSyntaxError("unterminated quoted field ref")
                sf.ref = "".join(buf)
                sf.quoted = True
            elif cur.peek() == '"':
                # double-quoted ref: full escapes \" \\ \n \t \r \xHH
                # (field_reference.md escape table)
                cur.pos += 1
                buf = []
                while not cur.eof():
                    ch = cur.text[cur.pos]
                    if ch == "\\" and cur.pos + 1 < len(cur.text):
                        nxt = cur.text[cur.pos + 1]
                        if nxt == "x" and cur.pos + 3 < len(cur.text):
                            buf.append(chr(int(cur.text[cur.pos + 2 : cur.pos + 4], 16)))
                            cur.pos += 4
                        else:
                            buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                            cur.pos += 2
                    elif ch == '"':
                        cur.pos += 1
                        break
                    else:
                        buf.append(ch)
                        cur.pos += 1
                else:
                    raise WplSyntaxError("unterminated quoted field ref")
                sf.ref = "".join(buf)
                sf.quoted = True
            else:
                sf.ref = cur.match_re(re.compile(r"[A-Za-z0-9_./\-\[\]*]+")) or "*"
        if cur.try_tok(":"):
            # subfield :name uses take_key (utils.rs:45), which ALSO
            # allows '/' — unlike main-field names (take_var_name has no
            # slash): `digit@src_ip/beijing : src-ip/changsha` is valid
            sf.name = cur.match_re(_SUBNAME_RE)
        if cur.peek() == '"':  # quote fmt (grammar: [format] after name)
            sf.fmt = '"'
            cur.pos += 1
        elif cur.peek() == "<":
            # scope fmt on the subfield type (wpl_id_field runs
            # wpl_field_fmt after @ref/:name — `kv(time<[,]>@curr)` is
            # therefore TWO subfields: time<[,]> bound to the default
            # '*' key, then @curr with the default type)
            end = _find_scope_end(cur.text, cur.pos)
            sf.scope = _split_scope(cur.text[cur.pos + 1 : end])
            cur.pos = end + 1
        _try_parse_sep(cur)  # subfield sep: accepted, inert (grammar allows)
        while True:  # {pipe}: transform/guard calls on the extracted value
            save = cur.pos
            cur.skip_ws()
            if not cur.try_tok("|"):
                cur.pos = save
                break
            cur.skip_ws()
            if cur.peek() == "(":
                # nested group pipe: the subfield value is RE-PARSED by
                # the group (wpl_group.rs test_parse_group_pipe3,
                # PipeEnum::Group in assemble_pipe)
                sf.subgroup = _parse_group(cur)
            else:
                sf.pipes.append(_parse_fun_call(cur))
        if cur.pos == start:  # no token consumed: malformed input, not a loop
            raise WplSyntaxError(
                f"bad subfield at {cur.pos}: {cur.text[cur.pos:cur.pos+20]!r}"
            )
        subs.append(sf)
    return subs


def _parse_fun_call(cur: _Cursor) -> FunCall:
    name = cur.match_re(re.compile(r"[A-Za-z_][A-Za-z0-9_]*"))
    if not name:
        raise WplSyntaxError(f"pipe function expected at {cur.pos}")
    call = FunCall(name=name)
    cur.skip_ws()
    if cur.peek() != "(":
        return call
    cur.expect("(")
    if name == "not":
        call.inner = _parse_fun_call(cur)
        cur.expect(")")
        return call
    # arguments: quoted strings, numbers, keys, or [array,...]
    while True:
        cur.skip_ws()
        if cur.try_tok(")"):
            break
        if cur.try_tok(","):
            continue
        if cur.peek() == '"' or cur.text.startswith("r#\"", cur.pos):
            call.args.append(_parse_string(cur))
        elif cur.peek() == "'":
            # single-quoted = raw string: backslashes stay literal EXCEPT
            # \' which escapes the closing quote (take_quoted_demo.wpl
            # example 4: take('field\'s name'))
            cur.pos += 1
            buf = []
            while not cur.eof():
                ch = cur.text[cur.pos]
                if (
                    ch == "\\"
                    and cur.pos + 1 < len(cur.text)
                    and cur.text[cur.pos + 1] == "'"
                ):
                    buf.append("'")
                    cur.pos += 2
                elif ch == "'":
                    cur.pos += 1
                    break
                else:
                    buf.append(ch)
                    cur.pos += 1
            else:
                raise WplSyntaxError("unterminated string")
            call.args.append("".join(buf))
        elif cur.peek() == "[":
            depth = 0
            i = cur.pos
            while i < len(cur.text):
                if cur.text[i] == "[":
                    depth += 1
                elif cur.text[i] == "]":
                    depth -= 1
                    if depth == 0:
                        break
                i += 1
            call.args.append(cur.text[cur.pos : i + 1])
            cur.pos = i + 1
        else:
            arg = cur.match_re(re.compile(r"[^,)\s]+"))
            if arg is None:
                raise WplSyntaxError(f"bad argument at {cur.pos}")
            call.args.append(arg)
    return call
