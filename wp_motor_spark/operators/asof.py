"""As-of (most-recent-prior) join — the temporal join Spark SQL lacks.

For every left row, attach the latest right row with the same key and
`right.ts <= left.ts` (backward as-of; inclusive, matching DuckDB/pandas
ASOF semantics). The classic use: each purchase event picks up the most
recent prior page-view of the same user.

Spark-first plan — NOT a range join: a range-predicate join explodes to
|left|×|right-per-key| comparisons and Catalyst can only nested-loop it.
Instead the two sides are union-tagged and sorted once per key, and the
match is `last(right_payload, ignorenulls)` over an unbounded-preceding
window — ONE shuffle on the key, O(n log n) per key, no pair expansion.
This is the plan a purpose-built engine runs for as-of (merge of two
sorted streams), expressed in DataFrame ops.

Determinism: callers should make the right side unique per (key, ts)
first (e.g. aggregate) — with duplicates, which same-timestamp right row
wins depends on partition-internal order, which another engine need not
reproduce.

At 100 TB: shuffle volume is |left|+|right| rows of key+ts+payload; a
hot key (one user with 10⁹ events) serializes within its partition —
pre-split such keys by time-bucket and as-of join within buckets,
carrying the previous bucket's last row forward (the streaming variant in
streaming/state.py does exactly that with state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_ts: str | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join. direction='backward' (default) attaches the
    LATEST right row with right.ts <= left.ts; direction='forward' the
    EARLIEST right row with right.ts >= left.ts (both inclusive —
    DuckDB/pandas conventions). Returns every `left` row plus the matched
    right payload columns (renamed `<col><suffix>`, null when no match
    exists or it violates `tolerance_us`)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    backward = direction == "backward"
    rts = right_ts or ts
    l_payload = list(left.columns)
    r_payload = [c for c in right.columns if c not in (on, rts)]
    l_types = dict(left.dtypes)
    r_types = dict(right.dtypes)
    l_struct_t = "struct<%s>" % ",".join(f"`{c}`:{l_types[c]}" for c in l_payload)
    r_fields = [("__rts", r_types[rts])] + [(c, r_types[c]) for c in r_payload]
    r_struct_t = "struct<%s>" % ",".join(f"`{c}`:{t}" for c, t in r_fields)

    # side ordering decides equal-ts eligibility: backward wants right
    # rows BEFORE left at equal ts (inclusive <=); forward wants them
    # AFTER left (inclusive >=)
    l_side, r_side = (1, 0) if backward else (0, 1)
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*[F.col(c) for c in l_payload]).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(rts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(
            F.col(rts).alias("__rts"), *[F.col(c) for c in r_payload]
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    base = Window.partitionBy("__k").orderBy(
        F.col("__ts").asc(), F.col("__side").asc()
    )
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__r", ignorenulls=True)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__r", ignorenulls=True)
    matched = unioned.withColumn("__m", pick.over(w))
    out = matched.where(F.col("__side") == F.lit(l_side))
    m = F.col("__m")
    if tolerance_us is not None:
        if l_types[ts].startswith("timestamp"):
            gap = F.unix_micros(F.col("__ts")) - F.unix_micros(m["__rts"])
        else:  # numeric time axis: tolerance is in the column's own units
            gap = F.col("__ts") - m["__rts"]
        if not backward:
            gap = -gap
        m = F.when(m.isNotNull() & (gap <= int(tolerance_us)), F.col("__m"))
    cols = [F.col("__l")[c].alias(c) for c in l_payload]
    cols.append(m["__rts"].alias(rts + suffix))
    cols.extend(m[c].alias(c + suffix) for c in r_payload)
    return out.select(*cols)
