"""wpgen parity: invert WPL rules into generators of matching random lines.

Reference: crates/wp-lang/src/generator/{rule.rs,fmt.rs} + the wpgen CLI
(docs/usage/en/01-cli/04-wpgen.md). Each field parser inverts to an
expression producing a value that parser accepts; fields join with the
rule's separators; scope/quote formats and symbols are re-emitted.

Spark-first shape: `spark.range(n)` + deterministic xxhash64-seeded
expressions — a billion-line corpus generates fully parallel with no
driver loop, and the same seed always yields the same corpus (CI-stable).
Rate-controlled streaming (`speed/` in the reference) maps to the `rate`
source: one generated line per tick.

Per-field overrides mirror gen_field.toml (generator/rule.rs FieldGenConf):
    overrides = {"sip": {"choices": [...]}} | {"bytes": {"range": (0, 4096)}}
              | {"sn": {"fmt": "SN-{val}"}}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from wp_motor_spark.wpl.ast import WplField, WplGroup, WplRule
from wp_motor_spark.wpl.parser import parse_wpl

_WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
_AGENTS = [
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
    "curl/8.4.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Safari/605.1.15",
]
_METHODS = ["GET", "POST", "PUT", "DELETE"]
_STATUSES = [200, 200, 200, 301, 404, 500]
_BASE_TS = 1700000000  # 2023-11-14T22:13:20Z


def _ip4_to_long(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def load_gen_field_overrides(text: str) -> dict:
    """gen_field.toml (FieldsGenRule / FieldGenConf, generator/rule.rs) ->
    the overrides dict `generate_lines` takes. Scope variants map to the
    same semantics: digit/float {beg,end}, ip {beg,end} (inclusive IPv4
    range), chars = value list; gen_fmt renders the value into a
    "SN-{val}"-style template."""
    import tomllib

    doc = tomllib.loads(text)
    out: dict[str, dict] = {}
    for name, conf in doc.get("items", {}).items():
        ov: dict = {}
        scope = conf.get("scope", {})
        if "ip" in scope:
            ov["ip_range"] = (scope["ip"]["beg"], scope["ip"]["end"])
        elif "float" in scope:
            ov["frange"] = (scope["float"]["beg"], scope["float"]["end"])
        elif "digit" in scope:
            ov["range"] = (scope["digit"]["beg"], scope["digit"]["end"])
        elif "chars" in scope:
            vals = scope["chars"]
            ov["choices"] = (
                vals if isinstance(vals, list) else list(vals.values())
            )
        if conf.get("gen_fmt"):
            ov["fmt"] = conf["gen_fmt"]
        if ov:
            out[name] = ov
    return out


def _rnd(id_col: Column, salt: int, mod: int) -> Column:
    """Deterministic pseudo-random int in [0, mod)."""
    return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(mod))


def _choice(id_col: Column, salt: int, items: list) -> Column:
    arr = F.array(*[F.lit(str(x)) for x in items])
    return F.try_element_at(arr, (_rnd(id_col, salt, len(items)) + 1).cast("int"))


class _Gen:
    def __init__(self, id_col: Column, overrides: dict | None):
        self.id = id_col
        self.overrides = overrides or {}
        self.salt = 0
        self.parts: list[Column] = []

    def nsalt(self) -> int:
        self.salt += 1
        return self.salt

    # ------------------------------------------------------------- field gen

    def field_value(self, fld: WplField) -> Column:
        name = fld.name or fld.dtype
        ov = self.overrides.get(name)
        if ov:
            base: Column | None = None
            if "choices" in ov:
                base = _choice(self.id, self.nsalt(), ov["choices"])
            elif "ip_range" in ov:  # GenScopeEnum::Ip — HALF-OPEN [beg, end)
                # like the digit/float scopes (reference rng.random_range):
                # the configured end address is never emitted.
                lo, hi = (_ip4_to_long(x) for x in ov["ip_range"])
                n = _rnd(self.id, self.nsalt(), max(hi - lo, 1)) + F.lit(lo)
                base = F.format_string(
                    "%d.%d.%d.%d",
                    F.shiftright(n, 24).bitwiseAND(F.lit(255)),
                    F.shiftright(n, 16).bitwiseAND(F.lit(255)),
                    F.shiftright(n, 8).bitwiseAND(F.lit(255)),
                    n.bitwiseAND(F.lit(255)),
                )
            elif "frange" in ov:  # GenScopeEnum::Float — [beg, end)
                lo, hi = ov["frange"]
                cents = _rnd(self.id, self.nsalt(), max(int((hi - lo) * 100), 1))
                base = F.format_string(
                    "%.2f", F.lit(float(lo)) + cents.cast("double") / 100.0
                )
            elif "range" in ov:
                lo, hi = ov["range"]
                base = (_rnd(self.id, self.nsalt(), hi - lo) + F.lit(lo)).cast(
                    "string"
                )
            if "fmt" in ov:  # gen_fmt "SN-{val}" renders the scoped value
                val = (
                    base
                    if base is not None
                    else _rnd(self.id, self.nsalt(), 100000).cast("string")
                )
                pre, _, post = ov["fmt"].partition("{val}")
                return F.concat(F.lit(pre), val, F.lit(post))
            if base is not None:
                return base
        s = self.nsalt
        d = fld.dtype
        if d == "ip":
            return F.format_string(
                "10.%d.%d.%d",
                _rnd(self.id, s(), 256),
                _rnd(self.id, s(), 256),
                _rnd(self.id, s(), 254) + 1,
            )
        if d == "ip_net":
            return F.format_string("10.%d.0.0/16", _rnd(self.id, s(), 256))
        if d in ("digit",):
            return _rnd(self.id, s(), 10000).cast("string")
        if d in ("port",):
            return (_rnd(self.id, s(), 65535) + 1).cast("string")
        if d == "float":
            return F.format_string("%d.%02d", _rnd(self.id, s(), 1000), _rnd(self.id, s(), 100))
        if d == "bool":
            return _choice(self.id, s(), ["true", "false"])
        if d == "hex":
            return F.lower(F.hex(F.abs(F.xxhash64(self.id, F.lit(s())))))
        if d == "sn":
            return F.format_string("SN-%05d", _rnd(self.id, s(), 100000))
        if d.startswith("time"):
            ts = F.timestamp_seconds(F.lit(_BASE_TS) + _rnd(self.id, s(), 86400))
            if d == "time/clf":
                return F.concat(F.date_format(ts, "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000"))
            if d == "time_3339":
                return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ssXXX")
            if d == "time_2822":
                return F.date_format(ts, "EEE, d MMM yyyy HH:mm:ss Z")
            if d == "time_timestamp":
                return (F.lit(_BASE_TS) + _rnd(self.id, s(), 86400)).cast("string")
            return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
        if d == "http/request":
            return F.format_string(
                "%s /p/%d HTTP/1.1",
                _choice(self.id, s(), _METHODS),
                _rnd(self.id, s(), 1000),
            )
        if d == "http/status":
            return _choice(self.id, s(), _STATUSES)
        if d == "http/method":
            return _choice(self.id, s(), _METHODS)
        if d == "http/agent":
            return _choice(self.id, s(), _AGENTS)
        if d == "url":
            return F.format_string("http://example.com/r/%d", _rnd(self.id, s(), 1000))
        if d == "domain":
            return F.format_string("host%d.example.com", _rnd(self.id, s(), 100))
        if d == "email":
            return F.format_string("user%d@example.com", _rnd(self.id, s(), 1000))
        if d == "mobile_phone":
            return F.format_string("13%09d", _rnd(self.id, s(), 1000000000))
        if d == "kv":
            return F.format_string("k%d=v%d", _rnd(self.id, s(), 10), _rnd(self.id, s(), 100))
        if d == "json":
            return F.format_string('{"k":%d}', _rnd(self.id, s(), 100))
        if d.startswith("array"):
            return F.format_string('["a%d","b%d"]', _rnd(self.id, s(), 10), _rnd(self.id, s(), 10))
        # chars / auto / _ / everything else: one random word
        return _choice(self.id, s(), _WORDS)

    # ------------------------------------------------------------ group walk

    def _sep(self, sep: Column | None) -> None:
        if self.parts:
            self.parts.append(sep if sep is not None else F.lit(" "))

    def emit_field(self, fld: WplField, lead: Column | None, rep: Column | None) -> None:
        """`lead` separates this field from the previous one; `rep`
        separates this field's own repeats (field-declared sep)."""
        if fld.dtype == "peek_symbol":
            return
        if fld.dtype == "symbol":
            self._sep(lead)
            self.parts.append(F.lit(fld.symbol or ""))
            return
        n = fld.repeat if fld.repeat is not None else 3
        for k in range(n):
            self._sep(lead if k == 0 else rep)
            val = self.field_value(fld)
            if fld.fmt == ('"', '"'):
                val = F.concat(F.lit('"'), val, F.lit('"'))
            elif fld.fmt is not None:
                b, e = fld.fmt
                val = F.concat(F.lit(b), val, F.lit(e))
            self.parts.append(val)

    def emit_group(self, grp: WplGroup, parent_sep: str | None) -> None:
        sep_lit = grp.sep if grp.sep is not None else parent_sep
        items = grp.items
        if grp.meta == "alt" and items:
            items = [items[0]]  # generate the first alternative
        if grp.meta == "not":
            return
        # separator between item i-1 and i: item i-1's declared separator
        # when present, else group/default (mirrors the parse compiler)
        prev_declared: str | None = None
        for i, item in enumerate(items):
            if isinstance(item, WplGroup):
                self.emit_group(item, sep_lit)
                prev_declared = None
                continue
            lead_lit = prev_declared if prev_declared is not None else sep_lit
            own = item.sep if item.sep is not None else sep_lit
            self.emit_field(
                item,
                F.lit(lead_lit) if lead_lit is not None else None,
                F.lit(own) if own is not None else None,
            )
            prev_declared = item.sep


def line_expr(rule: WplRule, id_col: Column, overrides: dict | None = None) -> Column:
    """One generated line matching `rule`, as a Column over an id column."""
    g = _Gen(id_col, overrides)
    for gi, grp in enumerate(rule.groups):
        if gi > 0:
            g.parts.append(F.lit(" "))
        g.emit_group(grp, None)
    return F.concat(*g.parts) if g.parts else F.lit("")


def generate_lines(
    spark: SparkSession,
    rule: WplRule | str,
    n: int,
    overrides: dict | None = None,
    seed: int = 0,
) -> DataFrame:
    """n deterministic lines matching the rule -> DataFrame[value]."""
    if isinstance(rule, str):
        rule = parse_wpl(rule)[0]
    ids = spark.range(n).select((F.col("id") + F.lit(seed * 1_000_003)).alias("id"))
    return ids.select(line_expr(rule, F.col("id"), overrides).alias("value"))


def generate_stream(
    spark: SparkSession,
    rule: WplRule | str,
    rows_per_second: int = 100,
    overrides: dict | None = None,
) -> DataFrame:
    """Rate-controlled generator stream (reference: src/runtime/generator/
    speed/) — the `rate` source emits ticks, each becoming one line."""
    if isinstance(rule, str):
        rule = parse_wpl(rule)[0]
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(line_expr(rule, F.col("value"), overrides).alias("value"))
