"""Syslog source: RFC6587 TCP framing + RFC3164 message parsing.

Reference: src/sources/syslog/{RFC6587_FRAMING.md,tcp_source.rs,
udp_source.rs} and the encoder src/protocol/syslog/encoder.rs:36-48.

Spark-first split of responsibilities:
- framing (byte-stream -> messages) is connection-local imperative logic —
  plain Python used by the socket collectors (sources/net.py) and by
  `frame_file` for batch re-parsing of captured streams;
- message parsing (RFC3164 header -> typed fields) is pure Column
  expressions, map-only at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MAX_FRAME = 10_000_000  # sanity cap, tcp.rs framing (0 < len < 10MB)


# ------------------------------------------------------------------ framing


def frame_buffer(buf: bytes, mode: str = "auto") -> tuple[list[bytes], bytes]:
    """RFC6587 framing (RFC6587_FRAMING.md + src/sources/tcp).

    ``mode`` mirrors the TCP source's FramingMode knob (tcp/config.rs:
    'auto' | 'line' | 'len', with 'length' accepted for 'len'):

    - ``auto`` (default) — octet counting (`<len> <msg>`) tried first,
      newline-delimited as the fallback, exactly the live connection
      dispatch (conn/connection.rs extract_message: Auto =
      extract_length_prefixed_message .or_else extract_line_message);
    - ``line`` — newline frames only;
    - ``len``  — length-prefixed frames only (incomplete payload waits).

    Returns (complete messages, unconsumed tail). The octet digit run is
    bounded at 10 chars and the value at 10MB (tcp.rs sanity bound);
    the legacy framing.rs drain_* API differs (trailing-only trim,
    zero-length rejected, wait-on-in-progress) but is dead code — the
    wired path is FramingExtractor, matched here.
    """
    if mode == "length":
        mode = "len"
    if mode not in ("auto", "line", "len"):
        raise ValueError(f"invalid framing {mode!r} (expect auto|line|len)")
    out: list[bytes] = []
    while buf:
        if mode in ("auto", "len"):
            consumed = _try_octet(buf)
            if consumed is not None:
                msg, buf = consumed
                out.append(msg)
                continue
            if mode == "len":
                break  # incomplete or invalid — wait for more data
        nl = buf.find(b"\n")
        if nl < 0:
            break
        # extract_line_message (framing/extractor.rs:9-25) removes EVERY
        # '\r' in the line (the compaction loop), not just a trailing CR
        line = buf[:nl].replace(b"\r", b"")
        buf = buf[nl + 1 :]
        if line:
            out.append(line)
    return out, buf


def _try_octet(buf: bytes) -> tuple[bytes, bytes] | None:
    head = buf[:10]
    sp = head.find(b" ")
    if sp <= 0:
        return None
    prefix = buf[:sp]
    if not prefix.isdigit():
        return None
    n = int(prefix)
    # "0 " is a VALID zero-length frame (extractor.rs
    # test_extract_length_prefixed_message_zero_length); the 10MB upper
    # cap is tcp.rs's sanity bound on real sockets
    if not (0 <= n < MAX_FRAME):
        return None
    start = sp + 1
    if len(buf) < start + n:
        return None  # incomplete — wait for more data
    return buf[start : start + n], buf[start + n :]


def frame_file(path: str) -> list[bytes]:
    """Frame a captured TCP byte stream from a file (batch re-parse)."""
    with open(path, "rb") as f:
        msgs, tail = frame_buffer(f.read())
    if tail:
        msgs.append(tail)
    return msgs


# ------------------------------------------------------------------ parsing

# RFC3164: <pri>MMM dd HH:mm:ss host tag[pid]: msg   (+ RFC5424-ish year form)
_R3164 = r"^<(\d{1,3})>([A-Z][a-z]{2}\s+\d{1,2}(?:\s+\d{4})?\s+\d{2}:\d{2}:\d{2}|\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.\d]*)?(?:Z|[+-]\d{2}:?\d{2})?)\s+(\S+)\s+([^:\[\s]+)(?:\[(\d+)\])?:?\s(.*)$"

# header-only prefix (fast_strip): everything _R3164 captures BEFORE the
# MSG group, so a regexp_replace drops just the header in one pass
_R3164_PREFIX = (
    r"^<\d{1,3}>"
    r"(?:[A-Z][a-z]{2}\s+\d{1,2}(?:\s+\d{4})?\s+\d{2}:\d{2}:\d{2}"
    r"|\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.\d]*)?(?:Z|[+-]\d{2}:?\d{2})?)"
    r"\s+\S+\s+[^:\[\s]+(?:\[\d+\])?:?\s"
)


def _r3164_ts(v):
    """Parsed header timestamp; the year-less RFC3164 form assumes the
    CURRENT year (same rule as the reference's time/rfc.rs parse_date_4),
    never 1970."""
    raw_ts = F.nullif(F.regexp_extract(v, _R3164, 2), F.lit(""))
    squashed = F.regexp_replace(raw_ts, r"\s+", " ")
    return F.coalesce(
        F.try_to_timestamp(
            F.concat(F.date_format(F.current_date(), "yyyy"), F.lit(" "), squashed),
            F.lit("yyyy MMM d HH:mm:ss"),
        ),
        F.try_to_timestamp(squashed, F.lit("MMM d yyyy HH:mm:ss")),
        F.try_to_timestamp(F.regexp_replace(squashed, "T", " ")),
    )


def parse_rfc3164(df: DataFrame, col: str = "value") -> DataFrame:
    """RFC3164 lines -> typed columns: pri, facility, severity, ts, host,
    app, pid, msg (+ _syslog_ok flag). Pure regexp extraction."""
    v = F.col(col)
    pri = F.regexp_extract(v, _R3164, 1).try_cast("int")
    ts = _r3164_ts(v)
    return df.select(
        v.alias("value"),
        pri.alias("pri"),
        F.floor(pri / 8).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        ts.alias("ts"),
        F.nullif(F.regexp_extract(v, _R3164, 3), F.lit("")).alias("host"),
        F.nullif(F.regexp_extract(v, _R3164, 4), F.lit("")).alias("app"),
        F.regexp_extract(v, _R3164, 5).try_cast("long").alias("pid"),
        F.nullif(F.regexp_extract(v, _R3164, 6), F.lit("")).alias("msg"),
        v.rlike(_R3164).alias("_syslog_ok"),
    )


def encode_rfc3164(
    pri: Column, ts: Column, host: Column, app: Column, msg: Column
) -> Column:
    """RFC3164 line: `<pri>MMM dd HH:mm:ss host app: msg`
    (encoder.rs:36-48; defaults match the reference)."""
    return F.concat(
        F.lit("<"),
        F.coalesce(pri.cast("string"), F.lit("13")),
        F.lit(">"),
        F.date_format(F.coalesce(ts, F.current_timestamp()), "MMM dd HH:mm:ss"),
        F.lit(" "),
        F.coalesce(host, F.lit("localhost")),
        F.lit(" "),
        F.coalesce(app, F.lit("wp-engine")),
        F.lit(": "),
        F.coalesce(msg, F.lit("")),
    )


# header_mode spelling: NEW names raw/skip/tag with keep/strip/parse kept
# as legacy aliases (src/sources/syslog/mod.rs
# test_syslog_header_mode_new_names + _legacy_aliases:
# raw=keep -> no strip, no tags; skip=strip -> strip only;
# tag=parse -> strip + meta tags)
_HEADER_MODE_ALIASES = {"raw": "keep", "skip": "strip", "tag": "parse"}


def apply_header_mode(
    df: DataFrame, mode: str = "parse", fast_strip: bool = False, col: str = "value"
) -> DataFrame:
    """Syslog source header_mode (04-syslog_source.md):

    - ``raw`` (legacy ``keep``)  — pass lines through untouched
    - ``skip`` (legacy ``strip``) — remove the RFC3164 header, keep only
      the MSG part; no tag injection (with ``fast_strip`` this is one
      regexp_replace that never builds the parsed columns)
    - ``tag`` (legacy ``parse``, default) — parse + inject the header
      fields as tag columns (host/app/pri/facility/severity/ts/pid) and
      strip the header from ``value``

    Unparseable lines pass through unchanged in every mode (the
    reference forwards them as-is rather than dropping).
    """
    mode = _HEADER_MODE_ALIASES.get(mode, mode)
    if mode == "keep":
        return df
    if mode == "strip":
        # prefix removal in one pass (fast_strip disables nothing extra
        # here — both spellings are a single regexp); OTHER columns
        # (wp_src_ip etc. from the collectors) pass through untouched
        return df.withColumn(
            col, F.regexp_replace(F.col(col), _R3164_PREFIX, "")
        )
    if mode == "parse":
        v = F.col(col)
        ok = v.rlike(_R3164)
        pri = F.regexp_extract(v, _R3164, 1).try_cast("int")
        out = df.withColumns(
            {
                "pri": pri,
                "facility": F.floor(pri / 8).cast("int"),
                "severity": F.pmod(pri, F.lit(8)).cast("int"),
                "ts": _r3164_ts(v),
                "host": F.nullif(F.regexp_extract(v, _R3164, 3), F.lit("")),
                "app": F.nullif(F.regexp_extract(v, _R3164, 4), F.lit("")),
                "pid": F.regexp_extract(v, _R3164, 5).try_cast("long"),
            }
        )
        return out.withColumn(
            col,
            F.when(ok, F.regexp_extract(v, _R3164, 6)).otherwise(v),
        )
    raise ValueError(f"unknown header_mode {mode!r}")


# ------------------------------------------------------- normalize.rs parity

# dependency-light header normalizer (src/sources/syslog/normalize.rs):
# RFC5424 tried FIRST, then a STRICT RFC3164 (valid month list, exact
# HH:MM:SS, single mandatory spaces), else plaintext passthrough. This is
# deliberately stricter than the udp_source.rs header parser above
# (_R3164 accepts ISO timestamps and bare tags) — normalize.rs
# test_non_standard_format_should_not_strip pins that '<11>2025-07-07
# 09:42:43,132 ...' must NOT be treated as RFC3164.

_FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "clock", "authpriv", "ftp", "ntp", "audit", "alert", "cron",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
]  # normalize.rs facility_name
_SEVERITY_NAMES = [
    "emerg", "alert", "crit", "err", "warn", "notice", "info", "debug",
]  # normalize.rs severity_name

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"

# <PRI>VERSION SP TS SP HOST SP APP SP PROCID SP MSGID SP (- | [..]) [SP] MSG
# five tokens are [^ ]* each followed by exactly one space (empty tokens
# allowed — the reference's skip loop consumes a token up to the next
# space without requiring content)
_RFC5424_RE = r"^<(\d+)>\d+ (?:[^ ]* ){5}(?:-|\[[^\]]*\]) ?([\s\S]*)$"

# <PRI>MMM( )?D(D) HH:MM:SS HOSTNAME TAG: MSG — month from the fixed
# list, exact 2-digit time fields, single spaces, first ': ' splits msg
_RFC3164_STRICT_RE = (
    r"^<(\d+)>(?:" + _MONTHS + r")  ?\d{1,2} "
    r"\d{2}:\d{2}:\d{2} [^ ]+ [^\n]*?: ([\s\S]*)$"
)


def _pri_meta(pri: Column) -> dict[str, Column]:
    """pri -> (pri & 0xFF, facility NAME, severity NAME) exactly like
    normalize.rs parse_pri_from_header: PRI parses as u16 (anything
    above 65535 fails upstream — see normalize()), facility = (pri/8)
    as u8 (pre-mask division, the cast WRAPS mod 256: pri=2048 ->
    facility 0 -> 'kern'), severity = pri%8, names from the fixed
    tables, 'unknown' past the end."""
    fac_code = F.pmod(F.floor(pri / 8), F.lit(256)).cast("int")
    sev_code = F.pmod(pri, F.lit(8)).cast("int")
    fac_arr = F.array(*[F.lit(x) for x in _FACILITY_NAMES])
    sev_arr = F.array(*[F.lit(x) for x in _SEVERITY_NAMES])
    return {
        "pri": F.pmod(pri, F.lit(256)).cast("int"),
        "facility": F.coalesce(
            F.try_element_at(fac_arr, fac_code + F.lit(1)), F.lit("unknown")
        ),
        "severity": F.coalesce(
            F.try_element_at(sev_arr, sev_code + F.lit(1)), F.lit("unknown")
        ),
    }


def normalize(df: DataFrame, col: str = "value") -> DataFrame:
    """normalize.rs `normalize`: adds message/pri/facility/severity columns.
    RFC5424 first, strict RFC3164 second, plaintext passthrough last
    (message = whole line, meta all NULL). Pure Column expressions —
    map-only at any scale."""
    v = F.col(col)
    is5424 = v.rlike(_RFC5424_RE)
    is3164 = v.rlike(_RFC3164_STRICT_RE)
    pri_str = F.when(is5424, F.regexp_extract(v, _RFC5424_RE, 1)).when(
        is3164, F.regexp_extract(v, _RFC3164_STRICT_RE, 1)
    )
    pri = pri_str.try_cast("int")
    # the reference parses PRI as u16: values above 65535 FAIL the parse
    # and yield all-None meta while the header is still stripped
    # (normalize.rs parse_pri_from_header's u16::from_str)
    pri_ok = pri.isNotNull() & (pri <= 65535)
    meta = _pri_meta(pri)
    msg = (
        F.when(is5424, F.regexp_extract(v, _RFC5424_RE, 2))
        .when(is3164, F.regexp_extract(v, _RFC3164_STRICT_RE, 2))
        .otherwise(v)
    )
    return df.withColumns(
        {
            "message": msg,
            "pri": F.when(pri_ok, meta["pri"]),
            "facility": F.when(pri_ok, meta["facility"]),
            "severity": F.when(pri_ok, meta["severity"]),
        }
    )
