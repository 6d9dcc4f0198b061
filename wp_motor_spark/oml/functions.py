"""OML pipe-function library: each reference pipe fn as a Column transform.

Reference: complete PipeFun enum
crates/wp-oml/src/language/syntax/functions/pipe/mod.rs:18-43; eval impls
crates/wp-oml/src/core/evaluator/transform/pipe/*.rs (SURVEY.md §2.5).

Ignore-propagation: the reference's `Value::Ignore` soft-null maps to SQL
NULL — every fn here propagates NULL and fns documented as "-> Ignore on
failure" return NULL on failure. Output formatting drops NULLs, matching the
reference's drop-on-output behavior.

All are JVM-side built-ins except html escape/unescape and str_escape,
which use small deterministic expression chains (no Python row loop).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve here
from pyspark.sql import Column, functions as F

# ------------------------------------------------------------ encode/decode


def base64_encode(col: Column) -> Column:
    """transform/pipe/base64.rs — chars -> base64."""
    return F.base64(col.cast("binary"))


# base64_decode charset arg -> JVM charset name (pipe_functions.md list)
_CHARSETS = {
    "utf8": None,  # fast path: plain cast
    "gbk": "gbk",
    "gb18030": "GB18030",
    "big5": "Big5",
    "eucjp": "EUC-JP",
    "euckr": "EUC-KR",
    "latin1": "ISO-8859-1",
    "shiftjis": "Shift_JIS",
    "utf16le": "UTF-16LE",
    "utf16be": "UTF-16BE",
}


def base64_decode(col: Column, charset: str = "Utf8") -> Column:
    """transform/pipe/base64.rs — base64 -> chars (charset list per
    docs/usage/en/04-oml/functions/pipe_functions.md).

    Invalid input -> Ignore(NULL) instead of a task failure. Validity
    matches the reference's strict engine (canonical padding required), so
    unpadded length%4 != 0 strings are rejected, not garbage-decoded.
    """
    cleaned = F.regexp_replace(col, r"\s+", "")
    valid = cleaned.rlike(
        r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
    ) & (F.length(cleaned) > 0)
    raw = F.when(valid, F.unbase64(cleaned))
    cs = _CHARSETS.get(charset.lower().replace("-", "").replace("_", ""), None)
    if cs is None:
        return raw.cast("string")
    if cs.lower() in ("iso-8859-1", "utf-16le", "utf-16be"):
        return F.decode(raw, cs)  # Spark 4 charset whitelist
    # GBK/Big5/EUC/Shift_JIS are outside Spark's decode whitelist —
    # Arrow-batched Python decode (cold path; fails soft to NULL)
    from pyspark.sql.functions import pandas_udf

    py_cs = cs

    @pandas_udf("string")
    def _decode(b: "pd.Series") -> "pd.Series":
        def one(x):
            if x is None:
                return None
            try:
                return bytes(x).decode(py_cs.replace("-", "_").lower())
            except (UnicodeDecodeError, LookupError):
                return None

        return b.map(one)

    return _decode(raw)


def html_escape(col: Column) -> Column:
    """transform/pipe/escape.rs — & < > " ' -> entities."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&#x27;"))


def html_unescape(col: Column) -> Column:
    c = F.replace(col, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&#x27;"), F.lit("'"))
    c = F.replace(c, F.lit("&#39;"), F.lit("'"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def json_escape(col: Column) -> Column:
    """transform/pipe/escape.rs — escape for embedding in a JSON string."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def json_unescape(col: Column) -> Column:
    """transform/pipe/escape.rs (escape8259::unescape) equivalent.

    Primary path: wrap the content in a one-element JSON array and let the
    JSON parser decode it — handles \\uXXXX, \\b, \\f, surrogate pairs
    exactly like escape8259. Rows the parser rejects (raw quotes/control
    chars in the content, invalid escapes) fall back to a literal replace
    chain; the reference returns input unchanged on invalid escapes, which
    the fallback approximates for the common escapes.
    """
    decoded = F.get(
        F.from_json(
            F.concat(F.lit('["'), col, F.lit('"]')), "array<string>"
        ),
        0,
    )
    # Escaped backslashes must be resolved FIRST (via a sentinel) or the
    # leftover `\` pairs with the next char: input `\\n` (backslash + 'n')
    # would otherwise become a newline. Multi-char sentinel (NUL+ESC framed)
    # so a literal NUL byte in the data is never rewritten.
    sent = "\x00\x1bWP_BSLASH\x1b\x00"
    c = F.replace(col, F.lit("\\\\"), F.lit(sent))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\/"), F.lit("/"))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\b"), F.lit("\b"))
    c = F.replace(c, F.lit("\\f"), F.lit("\f"))
    fallback = F.replace(c, F.lit(sent), F.lit("\\"))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(decoded, fallback)
    )


def str_escape(col: Column) -> Column:
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("'"), F.lit("\\'"))
    return F.replace(c, F.lit('"'), F.lit('\\"'))


def str_unescape(col: Column) -> Column:
    """Inverse of str_escape: \\\\ -> \\, \\' -> ', \\" -> " (grammar's
    str_unescape pipe; the reference declares the name in escape.rs
    without a shipped evaluator — round-trips str_escape exactly).
    Escaped backslashes resolve through a sentinel first so \\\\' stays a
    literal backslash + quote."""
    c = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    c = F.replace(c, F.lit("\\'"), F.lit("'"))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    return F.replace(c, F.lit("\x00"), F.lit("\\"))


# ------------------------------------------------------------ time

# Reference Time::to_ts defaults to UTC+8 when the input has no zone
# (docs/usage/zh/04-oml/functions/function_index.md time table).
DEFAULT_TZ = "Asia/Shanghai"


def to_ts(col: Column, tz: str = DEFAULT_TZ) -> Column:
    """transform/pipe/time.rs — timestamp/string -> epoch seconds.

    Session TZ is UTC, so a naive timestamp is a UTC wall-clock; the
    reference interprets zoneless inputs in ``tz`` (default UTC+8), which
    is exactly to_utc_timestamp(ts, tz).
    """
    ts = F.coalesce(F.try_to_timestamp(col.cast("string")), col.try_cast("timestamp"))
    return F.unix_timestamp(F.to_utc_timestamp(ts, tz))


def to_ts_ms(col: Column, tz: str = DEFAULT_TZ) -> Column:
    return to_ts(col, tz) * 1000


def to_ts_us(col: Column, tz: str = DEFAULT_TZ) -> Column:
    return to_ts(col, tz) * 1000000


def to_ts_zone(col: Column, zone: str, unit: str = "sec") -> Column:
    base = to_ts(col, zone)
    return {"sec": base, "ms": base * 1000, "us": base * 1000000}[unit]


def now_time() -> Column:
    """Now::time() builtin (functions/mod.rs:7)."""
    return F.current_timestamp()


def now_date() -> Column:
    # functions/time.rs NowDate: from_digit(y*10000 + m*100 + d) — a
    # DIGIT (long), not chars
    return F.date_format(F.current_timestamp(), "yyyyMMdd").cast("long")


def now_hour() -> Column:
    # functions/time.rs NowHour: from_digit(y*1000000 + m*10000 + d*100
    # + H) — a DIGIT (long), not chars
    return F.date_format(F.current_timestamp(), "yyyyMMddHH").cast("long")


# ------------------------------------------------------------ array / obj


def nth(col: Column, i: int) -> Column:
    """transform/pipe/array_obj.rs — 0-based element access."""
    return F.try_element_at(col, F.lit(i + 1))


def get_path(col: Column, path: str) -> Column:
    """transform/pipe/array_obj.rs — nested access 'a/b/c' over JSON/struct.

    For JSON string columns uses get_json_object (JVM, no parse UDF);
    path segments may include [i] indexes: 'details[0]/process_name'.
    """
    jp = "$." + path.replace("/", ".")
    return F.get_json_object(col, jp)


# ------------------------------------------------------------ string / misc


def starts_with_or_ignore(col: Column, prefix: str) -> Column:
    """other.rs — keep value if prefix matches else Ignore(NULL)."""
    return F.when(col.startswith(prefix), col)


def map_to(col: Column, value) -> Column:
    """other.rs:53 MapValue — non-Ignore input -> constant."""
    return F.when(col.isNotNull(), F.lit(value))


def to_str(col: Column) -> Column:
    return col.cast("string")


def to_json(col: Column) -> Column:
    return F.to_json(col)


def skip_empty(col: Column, dt=None, kind: str | None = None) -> Column:
    """array_obj.rs SkipEmpty — TYPE-AWARE emptiness: '' (chars), 0
    (digit), 0.0 (float), [] (array), {} (obj/map) all become Ignore
    (NULL); other types pass through. The OML compiler threads the input
    column's Spark dtype (`dt`) / container kind so non-string inputs
    dispatch on their own type instead of hitting a string comparison;
    with no type info the chars rule applies (string pipelines)."""
    from pyspark.sql import types as T

    if kind in ("array", "map") or isinstance(dt, (T.ArrayType, T.MapType)):
        cond = F.size(col) == 0  # size() counts array elements / map entries
    elif kind == "struct" or isinstance(dt, T.StructType):
        return col  # structs are never 'empty' in the reference match
    elif isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        cond = col == 0
    elif isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        cond = col == 0.0
    else:
        cond = col.cast("string") == ""
    return F.when(~cond, col)


def _path_norm(col: Column) -> Column:
    # path_url.rs PathGet: x.replace('\\', "/") FIRST — Windows paths
    # resolve with the same component logic as POSIX ones
    return F.replace(col, F.lit("\\"), F.lit("/"))


def path_name(col: Column) -> Column:
    """path_url.rs PathType::FileName — last component of the
    backslash-normalized path (C:\\..\\x.dll -> x.dll)."""
    return F.substring_index(_path_norm(col), "/", -1)


def path_path(col: Column) -> Column:
    """path_url.rs PathType::Path — Path::parent() of the normalized
    path ('' for a bare filename, like Rust's Path("file").parent())."""
    n = _path_norm(col)
    return (
        F.when(n == "/", F.lit("/"))
        .when(n.contains("/"), F.regexp_extract(n, r"^(.*)/[^/]*$", 1))
        .otherwise(F.lit(""))
    )


# url crate Url::port(): default scheme ports are normalized away, so
# url(host) appends ':port' only when the port is explicit AND non-default
_URL_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}


def url_part(col: Column, part: str) -> Column:
    """path_url.rs UrlType — domain|host|uri|path|params.

    Reference semantics (UrlGet::value_cacu): host = host_str + explicit
    non-default :port; uri = url[Position::BeforePath..] = path + ?query
    + #fragment; params = query or '' (empty, not null); every part
    falls back to the ORIGINAL string when Url::parse fails (approximated
    here as parse_url HOST being null)."""
    part = part.lower()
    phost = F.parse_url(col, F.lit("HOST"))
    parse_ok = phost.isNotNull()
    if part == "domain":
        return F.when(parse_ok, phost).otherwise(col)
    if part == "host":
        scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
        port = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:(\d+)(?:[/?#]|$)", 1)
        default_port = F.coalesce(
            *[F.when(scheme == s, F.lit(p)) for s, p in _URL_DEFAULT_PORTS.items()],
            F.lit(""),
        )
        explicit = (port != "") & (port != default_port)
        return F.when(
            parse_ok,
            F.when(explicit, F.concat(phost, F.lit(":"), port)).otherwise(phost),
        ).otherwise(col)
    if part == "path":
        return F.when(parse_ok, F.parse_url(col, F.lit("PATH"))).otherwise(col)
    if part in ("params", "query"):
        return F.when(
            parse_ok, F.coalesce(F.parse_url(col, F.lit("QUERY")), F.lit(""))
        ).otherwise(col)
    if part == "uri":
        p = F.parse_url(col, F.lit("PATH"))
        q = F.parse_url(col, F.lit("QUERY"))
        frag = F.parse_url(col, F.lit("REF"))
        uri = F.concat(
            p,
            F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
            F.when(frag.isNotNull(), F.concat(F.lit("#"), frag)).otherwise(F.lit("")),
        )
        return F.when(parse_ok, uri).otherwise(col)
    raise ValueError(f"unknown url part {part!r}")


def ip4_to_int(col: Column) -> Column:
    """net.rs ip4_to_int — dotted quad -> u32 (pure expression, no UDF)."""
    o = F.split(col, r"\.")
    return (
        F.try_element_at(o, F.lit(1)).try_cast("long") * 16777216
        + F.try_element_at(o, F.lit(2)).try_cast("long") * 65536
        + F.try_element_at(o, F.lit(3)).try_cast("long") * 256
        + F.try_element_at(o, F.lit(4)).try_cast("long")
    )


def fmt(template: str, *cols: Column) -> Column:
    """operations/fmt.rs — '{a}:{b}' interpolation -> format_string."""
    import re as _re

    java_tpl = _re.sub(r"\{[^}]*\}", "%s", template)
    return F.format_string(java_tpl, *cols)


# ------------------------------------------------------------ semantic (UDF)


def extract_main_word(col: Column) -> Column:
    """extract_word.rs — jieba tokenize + POS filter + stopword removal.

    jieba isn't available in this environment; provide a deterministic
    whitespace/ASCII fallback with the same shape (longest non-stopword
    token). Gate: swap in a jieba pandas_udf when the library is present.

    Honors the global [semantic] enabled switch (extract_word.rs:370 —
    disabled => empty string, the dict/tokenizer are never consulted).
    """
    from wp_motor_spark.oml.semantic import is_semantic_enabled

    if not is_semantic_enabled():
        return F.lit("")
    try:
        import jieba  # noqa: F401

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _jieba_main(s):  # pragma: no cover - env without jieba
            import jieba as _j
            import pandas as pd

            def one(x):
                if x is None:
                    return None
                toks = [t for t in _j.cut(x) if len(t.strip()) > 1]
                return max(toks, key=len) if toks else None

            return s.map(one)

        return _jieba_main(col)
    except ImportError:
        from wp_motor_spark.oml.semantic import semantic_dict

        d = semantic_dict()
        # domain words win outright (extract_word.rs priority: a known
        # log-domain keyword beats a merely-long token), then longest
        # non-stopword
        words = F.filter(
            F.split(F.lower(col), r"[^\p{L}\p{N}]+"),
            lambda w: (F.length(w) > 1) & ~w.isin(*sorted(d.stop_words)),
        )
        # FIRST domain word in token order (extract_word.rs rule-1 loop
        # scans tokens left-to-right), not the lexicographic max
        domain_hit = F.try_element_at(
            F.filter(words, lambda w: w.isin(*sorted(d.domain_words))),
            F.lit(1),
        )
        longest = F.array_max(
            F.transform(
                words,
                lambda w: F.struct(F.length(w).alias("n"), w.alias("w")),
            )
        ).getField("w")
        return F.coalesce(domain_hit, longest)


def extract_subject_object(col: Column) -> Column:
    """extract_word.rs — Subject-Action-Object-Status struct from log text.

    Heuristic expression version: first token = subject, the first
    semantic-dict ACTION VERB = action (falling back to token 2), the
    token after the action = object, and any STATUS WORD anywhere in the
    line = status — both word sets come from the semantic dictionary
    (built-ins + semantic_dict.toml merge, oml/semantic.py).

    Honors the global [semantic] enabled switch (extract_word.rs:311 —
    disabled => empty object; here: the same struct shape, all-null).
    """
    from wp_motor_spark.oml.semantic import is_semantic_enabled, semantic_dict

    if not is_semantic_enabled():
        null_s = F.lit(None).cast("string")
        return F.struct(
            null_s.alias("subject"),
            null_s.alias("action"),
            null_s.alias("object"),
            null_s.alias("status"),
        )

    d = semantic_dict()
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    actions = sorted(d.action_verbs)
    statuses = sorted(d.status_words)
    # position of the first action verb (0 = none)
    act_pos = F.coalesce(
        F.array_position(
            F.transform(toks, lambda w: w.isin(*actions)), F.lit(True)
        ),
        F.lit(0),
    )
    action = F.when(act_pos > 0, F.try_element_at(toks, act_pos.cast("int")))
    obj = F.when(
        act_pos > 0, F.try_element_at(toks, (act_pos + 1).cast("int"))
    )
    status = F.array_max(F.filter(toks, lambda w: w.isin(*statuses)))
    return F.struct(
        F.try_element_at(toks, F.lit(1)).alias("subject"),
        F.coalesce(action, F.try_element_at(toks, F.lit(2))).alias("action"),
        F.coalesce(obj, F.try_element_at(toks, F.lit(3))).alias("object"),
        status.alias("status"),
    )
