"""Separator-scan tokenizer experiment — built, measured, and REJECTED.

The reference's WPL engine is a memchr-based separator scanner
(crates/wp-lang/src/eval/value/parser/), not a regex VM. This module
compiles the common CLF/nginx rule shape (flat sequence of
whitespace-separated fields with quoted / bracketed spans) to a plan of
literal-char splits + substring scans, with a per-row lazy fallback to the
regex path for any row whose structure the fast plan cannot prove it
parses identically (wrong quote count, missing bracket, token-count
mismatch, non-space whitespace at a boundary, typed token failing its
content check).

Measured on the round-3 probe corpus (8M generated nginx-style lines,
local[32]; tools/profile_variants.py harness, same run):

    parts regex-only   1.471 s
    parts fast-only    1.618 s   <- the structural-validity checks cost
    parts hybrid       1.686 s      more than the one-pass regex saves
    e2e  regex-only    2.370 s  (105k events/s/core)
    e2e  hybrid        3.034 s  ( 82k events/s/core)

A bare split plan with no validity checks IS ~17% faster than the regex
(0.937 vs 1.133 s), but the checks are what make it semantics-preserving,
and they erase the win: ~10 extra string allocations (trim/ltrim/rtrim),
3 anchored rlikes for typed tokens, and array size checks per row. The
single anchored Java regex is already within ~20% of the split-plan floor
for this shape, so the engine keeps the regex path (see PROFILE.md §3).

Kept as a runnable experiment: `python tools/fastpath_experiment.py`
re-verifies output equivalence (0 mismatches over 8M rows) and re-times
both plans. Not imported by the engine.
"""

from __future__ import annotations

import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F  # noqa: E402

from wp_motor_spark.wpl.ast import WplField, WplGroup, WplRule  # noqa: E402
from wp_motor_spark.wpl.compiler import _content_regex  # noqa: E402
from wp_motor_spark.wpl.preproc import apply_preprocs  # noqa: E402

# plain (unfmt'd) fields whose content regex can contain whitespace can't
# be tokenized by a \s+ split — those rules keep the regex path
_FAST_WS_CONTENT = {
    "time",
    "time/clf",
    "time_iso",
    "time_3339",
    "time_2822",
    "http/request",
    "json",
    "exact_json",
    "proto_text",
    "array",
}
# dtypes whose typed content survives inside a quote/bracket fmt (mirrors
# keep_typed in _emit_single) — these need a post-hoc content check
_FAST_KEEP_TYPED = {"digit", "port", "http/status", "float", "bool", "hex"}
# content classes that are guaranteed by ws-split tokenisation itself
_FAST_NO_VALIDATE = {"chars", "auto", "sn", "_"}


def _fastpath_fields(rule: WplRule) -> list[WplField] | None:
    """Return the rule's flat field list (repeats expanded, one entry per
    regex group) if the separator-scan fast path can handle it, else None
    (regex path only)."""
    fields: list[WplField] = []
    for grp in rule.groups:
        if grp.meta != "seq" or grp.sep is not None or grp.pattern_sep is not None:
            return None
        for item in grp.items:
            if isinstance(item, WplGroup):
                return None
            f = item
            if f.repeat is None or f.subgroup is not None or f.pattern_sep is not None:
                return None
            if f.sep is not None and f.sep.strip() != "":
                return None  # literal separators: regex path
            if f.length is not None:
                return None
            if f.dtype in ("kv", "kvarr", "symbol", "peek_symbol"):
                return None
            if f.fmt is not None:
                b, e = f.fmt
                if len(b) != 1 or len(e) != 1:
                    return None
                if (b == '"') != (e == '"'):
                    return None
            elif not getattr(f, "_is_tail", False):
                if f.dtype in _FAST_WS_CONTENT or f.dtype.startswith("array"):
                    return None
            # N*type expands to N consecutive groups with the same seps the
            # emitter generates (required \s+ between plain repeats, \s*
            # after fmt'd ones) — the segment walk handles both
            fields.extend([f] * f.repeat)
    if not fields:
        return None
    # one bracket pair per rule (CLF shape); mixing pairs -> regex path
    pairs = {f.fmt for f in fields if f.fmt is not None and f.fmt != ('"', '"')}
    if len(pairs) > 1:
        return None
    last = fields[-1]
    if last.fmt is None and not getattr(last, "_is_tail", False):
        return None  # residue after a plain field is not reconstructible
    # tail field must not share its run with preceding plain fields
    if getattr(last, "_is_tail", False) and len(fields) > 1 and fields[-2].fmt is None:
        return None
    return fields


def _fast_token_check(f: WplField) -> str | None:
    """Anchored content regex a fast-path token must satisfy (None = none)."""
    if f.fmt is not None:
        if f.dtype not in _FAST_KEEP_TYPED:
            return None  # permissive [^end]* content, like the regex path
        return "^(?:" + _content_regex(f.dtype, None, None) + ")$"
    if getattr(f, "_is_tail", False) or f.dtype in _FAST_NO_VALIDATE:
        return None
    content = _content_regex(f.dtype, None, None)
    if content == r"[^\s]+":
        return None  # guaranteed by the \s+ split
    return "^(?:" + content + ")$"


def _compile_fastpath(rule: WplRule):
    """Compile the separator-scan plan. Returns build(value)->Column of
    array<string> (size n_groups) that is non-null iff the fast path proved
    the row parses identically to the regex path; else None if the rule
    shape is unsupported."""
    fields = _fastpath_fields(rule)
    if fields is None:
        return None
    n_fields = len(fields)
    residue_group = n_fields + 1
    # positional entries: (group_number, field) — repeats share the field
    # object, so identity-keying is wrong; group number is the identity
    entries = [(i + 1, f) for i, f in enumerate(fields)]
    quote_entries = [(g, f) for g, f in entries if f.fmt == ('"', '"')]
    nq = len(quote_entries)

    # segments between quote fields: list of entry-lists
    segments: list[list[tuple[int, WplField]]] = []
    cur: list[tuple[int, WplField]] = []
    for g, f in entries:
        if f.fmt == ('"', '"'):
            segments.append(cur)
            cur = []
        else:
            cur.append((g, f))
    segments.append(cur)
    last_group, last = entries[-1]
    last_is_quote = last.fmt == ('"', '"')
    last_is_tail = getattr(last, "_is_tail", False)

    def build(value: Column) -> Column:
        pre = apply_preprocs(value, rule.preprocs)
        conds: list[Column] = []
        toks: dict[int, Column] = {}
        q = F.split(pre, '"', -1) if nq else None

        if nq:
            conds.append(F.size(q) == 2 * nq + 1)
            for j, (g, _f) in enumerate(quote_entries):
                toks[g] = F.get(q, 2 * j + 1)

        def flush_run(run, run_entries, lead_forbid, trail_req):
            """Tokenize one whitespace-separated run of plain fields.

            Run starts are always at line start (leading ws forbidden: the
            regex anchors content at ^) or after a self-delimiting quote /
            bracket (\\s* — optional ws, trim handles it). Required \\s+
            separators only occur BETWEEN plain tokens (guaranteed by the
            split) or before a following delimiter (trail_req)."""
            if not run_entries:
                conds.append(F.trim(run) == "")  # \s* only
                return
            ts = F.split(F.trim(run), r"\s+", -1)
            conds.append(F.size(ts) == len(run_entries))
            if lead_forbid:
                conds.append(run == F.ltrim(run))
            if trail_req:
                conds.append(run != F.rtrim(run))
            for i, (g, _f) in enumerate(run_entries):
                toks[g] = F.get(ts, i)

        def flush_tail(run, prev_field):
            """Trailing bare chars field: consumes the rest; residue ''."""
            if prev_field is None:
                tok = run  # ^(.*) — no separator before the very first field
            else:
                # separator is \s* (prev is fmt'd): ltrim strips spaces; any
                # other leading whitespace would diverge from \s*, so those
                # rows go to the regex path
                tok = F.ltrim(run)
                conds.append(~F.substring(tok, 1, 1).isin("\t", "\r", "\n"))
            toks[last_group] = tok
            toks[residue_group] = F.lit("")

        for si, seg_entries in enumerate(segments):
            seg = F.get(q, 2 * si) if nq else pre
            is_last_seg = si == len(segments) - 1
            if is_last_seg and last_is_quote:
                # everything after the closing quote is residue, unchecked
                toks[residue_group] = F.get(q, 2 * nq)
                break
            # field preceding this segment: None at line start, else the
            # preceding quote field (self-delimiting -> optional \s*)
            prev: WplField | None = None if si == 0 else quote_entries[si - 1][1]
            bracket_entries = [(g, f) for g, f in seg_entries if f.fmt is not None]
            run_entries: list[tuple[int, WplField]] = []
            if bracket_entries:
                b_open, b_close = bracket_entries[0][1].fmt
                bs = F.split(seg, re.escape(b_open), -1)
                conds.append(F.size(bs) == len(bracket_entries) + 1)
                bi = 0
                run = F.get(bs, 0)
                for g, f in seg_entries:
                    if f.fmt is None:
                        run_entries.append((g, f))
                        continue
                    # flush the plain run before this bracket; \s+ before
                    # '[' is required iff the previous field is plain (i.e.
                    # the run is non-empty)
                    if run_entries:
                        flush_run(run, run_entries, lead_forbid=prev is None, trail_req=True)
                    elif prev is None:
                        conds.append(run == "")  # rule starts at '^['
                    else:
                        conds.append(F.trim(run) == "")  # \s* after fmt'd
                    piece = F.get(bs, bi + 1)
                    content = F.substring_index(piece, b_close, 1)
                    conds.append(F.instr(piece, b_close) > 0)
                    toks[g] = content
                    run = F.substring(piece, F.length(content) + 2, F.length(piece))
                    run_entries = []
                    prev = f
                    bi += 1
                # whatever follows the last bracket
                if is_last_seg and last.fmt is not None and not last_is_quote:
                    toks[residue_group] = run  # bracket is the final field
                elif is_last_seg and last_is_tail:
                    flush_tail(run, prev)
                else:
                    # middle segment: a non-empty trailing run sits before
                    # the next quote -> required \s+ there
                    flush_run(run, run_entries, lead_forbid=False, trail_req=bool(run_entries))
            else:
                if is_last_seg and last_is_tail:
                    flush_tail(seg, prev)
                else:
                    flush_run(
                        seg,
                        seg_entries,
                        lead_forbid=prev is None and bool(seg_entries),
                        trail_req=bool(seg_entries) and not is_last_seg,
                    )

        # typed-content checks on short tokens (exact regex fragments)
        for g, f in entries:
            rx = _fast_token_check(f)
            if rx is not None:
                conds.append(toks[g].rlike(rx))

        valid = conds[0]
        for c in conds[1:]:
            valid = valid & c
        arr = F.array(*[toks[g] for g in range(1, residue_group + 1)])
        return F.when(valid, arr)

    # compile-time sanity: every group 1..n_groups must be assigned exactly
    # once — a structural bug surfaces here as "no fast path", never as
    # silent wrong output
    try:
        probe = build(F.lit("x"))
        if probe is None:
            return None
    except Exception:
        return None
    build.n_groups = residue_group  # for parity check vs the regex plan
    return build




def main() -> None:
    import time

    from wp_motor_spark.session import get_spark
    from wp_motor_spark.wpl import compile_rule, parse_wpl
    from wp_motor_spark.wpl.generator import generate_lines

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark(app_name="fastpath_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    wpl = open("/root/reference/tests/instance/wpl/example/simple/parse.wpl").read()
    rule = parse_wpl(wpl)[0]
    cr = compile_rule(rule)
    fast = _compile_fastpath(rule)
    assert fast is not None, "probe rule should qualify"
    lines = generate_lines(spark, rule, n).persist()
    lines.count()
    v = F.col("value")
    taken = lines.select(fast(v).isNotNull().cast("int").alias("f")).agg(F.sum("f")).collect()[0][0]
    mism = (
        lines.select(fast(v).alias("a"), cr.parts_col(v).alias("b"))
        .where(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
        .count()
    )
    print(f"fast-path taken: {taken}/{n}   mismatches vs regex: {mism}")

    def bench(df):
        cols = [F.col(c) for c in df.columns]

        def one():
            t0 = time.perf_counter()
            df.select(F.max(F.xxhash64(*cols))).collect()
            return time.perf_counter() - t0

        one()
        return min(one(), one())

    w = bench(lines.select(cr.parts_col(v).alias("p")))
    print(f"parts regex  {w:6.3f}s  {n/w:,.0f} rows/s")
    w = bench(lines.select(F.coalesce(fast(v), cr.parts_col(v)).alias("p")))
    print(f"parts hybrid {w:6.3f}s  {n/w:,.0f} rows/s")
    spark.stop()


if __name__ == "__main__":
    main()
