"""Physical-plan linter: flags the scale anti-patterns a 100 TB run dies
on, from the same signals tests/test_plans.py asserts — but as a tool a
user can point at THEIR query before submitting it to a cluster.

Usage (library):
    from tools.plan_lint import lint
    warnings = lint(df)        # list of (code, message)

Usage (CLI, over the repo's own suite as a smoke):
    python tools/plan_lint.py [query_name ...]

Checks:
  NESTED_LOOP   BroadcastNestedLoopJoin / CartesianProduct — a
                non-equi join Catalyst can't hash; rewrite with an
                equi-key (bucketed_range_join, asof_join, zorder).
  PY_ROW_UDF    BatchEvalPython — row-at-a-time Python in the plan;
                use built-ins or Arrow (ArrowEvalPython/mapInPandas).
  SCAN_NO_PRUNE a parquet scan reading >2/3 of the table's columns
                under a narrow projection — check column pruning.
  NO_PUSHDOWN   a Filter directly above a FileScan whose PushedFilters
                is empty — predicate didn't reach the reader.
  WIDE_SHUFFLE  Exchange carrying a text/binary column — document
                payloads moving through a shuffle; shuffle digests/ids
                instead.
  BCAST_GROWING an explicit broadcast HINT on a subtree that explodes
                document/event content and then group-aggregates it
                without a LIMIT cap or a one-row global aggregate — a
                token/n-gram model table whose row count GROWS with the
                corpus (Heaps' law), over the broadcast ceiling at
                100 TB. Drop the hint (AQE broadcasts when actually
                small) or cap the table (top-K + OOV, the vocab_oov
                pattern). Detected on the ANALYZED logical plan, where
                ResolvedHint nodes are still visible.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_indent(line: str) -> int:
    """Depth of a logical-plan tree line: length of its ':  '/'+- '
    drawing prefix."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _broadcast_growing(analyzed: str) -> list[str]:
    """ResolvedHint(broadcast) subtrees that build a grow-with-corpus
    model table: the subtree EXPLODES content (Generate explode/
    posexplode — token/n-gram streams) and re-aggregates it by key
    (grouped Aggregate), with no GlobalLimit cap and no one-row global
    Aggregate on top. Returns a sketch of each offending subtree head."""
    lines = analyzed.splitlines()
    hits: list[str] = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln or "broadcast" not in ln.lower():
            continue
        ind = _tree_indent(ln)
        sub: list[str] = []
        for nxt in lines[i + 1:]:
            if _tree_indent(nxt) <= ind and nxt.strip():
                break
            sub.append(nxt)
        text = "\n".join(sub)
        if not re.search(r"Generate (pos)?explode", text):
            continue
        if re.search(r"(Global|Local)Limit", text):
            continue  # top-K capped — bounded by construction
        # the TOPMOST Aggregate in the hinted subtree decides the
        # broadcast's cardinality: a global one-row agg ('Aggregate
        # [sum(...) AS n]', single list) is bounded no matter what
        # feeds it; a grouped agg is unbounded ONLY when its grouping
        # key is a token/n-gram-like column (Heaps' law) — grouping by
        # source/label/bucket-id stays at that key's cardinality
        for s in sub:
            m = re.search(r"Aggregate \[([^\]]*)\](, \[)?", s)
            if not m:
                continue
            if not m.group(2):
                break  # global one-row aggregate — bounded
            grouping = m.group(1)
            if re.search(
                r"\b(token|tok|term|w|w1|w2|w3|gram|ngram|bigram|trigram"
                r"|shingle|word|suffix|sfx)#\d",
                grouping,
            ):
                head = s.strip()
                hits.append(head[:100])
            break
    return hits


def lint(df) -> list[tuple[str, str]]:
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    out: list[tuple[str, str]] = []
    for head in _broadcast_growing(qe.analyzed().toString()):
        out.append(
            ("BCAST_GROWING",
             "broadcast hint on an exploded-and-regrouped (token/n-gram) "
             f"table that grows with the corpus — drop the hint or cap "
             f"with top-K [{head}]")
        )
    if "CartesianProduct" in plan:
        out.append(("NESTED_LOOP", "CartesianProduct in plan — unkeyed join"))
    if "BroadcastNestedLoopJoin" in plan:
        out.append(
            ("NESTED_LOOP",
             "BroadcastNestedLoopJoin — non-equi predicate; fine only for "
             "tiny broadcast sides (KnowDB dims), fatal otherwise")
        )
    if "BatchEvalPython" in plan:
        out.append(
            ("PY_ROW_UDF", "row-at-a-time Python UDF — use built-ins or Arrow")
        )
    for line in plan.splitlines():
        if "FileScan parquet" in line:
            m = re.search(r"ReadSchema: struct<([^>]*)>", line)
            if m:
                ncols = len([c for c in m.group(1).split(",") if c])
                if ncols >= 12:
                    out.append(
                        ("SCAN_NO_PRUNE",
                         f"scan reads {ncols} columns — verify pruning")
                    )
            if (
                "PushedFilters: []" in line
                and plan.count("FileScan parquet") == 1
                and m
            ):
                # only reliable for single-scan plans, and only when a
                # Filter references a SCAN column by name — filters on
                # derived columns (window ranks, post-explode values)
                # legitimately cannot push
                scan_cols = {
                    c.split(":")[0] for c in m.group(1).split(",") if c
                }
                filter_cols = set()
                for fl in plan.splitlines():
                    if fl.strip().startswith(("Filter (", "+- Filter", ": Filter")) or "Filter (" in fl:
                        filter_cols |= set(re.findall(r"([A-Za-z_][A-Za-z_0-9]*)#\d+", fl))
                if scan_cols & filter_cols:
                    out.append(
                        ("NO_PUSHDOWN",
                         "filter on scan columns but PushedFilters is empty")
                    )
        if "Exchange hashpartitioning" in line and re.search(
            r"\b(text|media|content)#\d+", line
        ):
            out.append(
                ("WIDE_SHUFFLE",
                 "shuffle carries a document/media payload column — "
                 "shuffle digests or ids instead")
            )
    # dedupe, stable order
    seen = set()
    uniq = []
    for w in out:
        if w not in seen:
            seen.add(w)
            uniq.append(w)
    return uniq


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("plan_lint")
        .getOrCreate()
    )
    qs = entrymod.queries()
    names = sys.argv[1:] or sorted(qs)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    worst = 0
    for name in names:
        try:
            warns = lint(qs[name](spark, sf))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(ex).__name__}")
            worst = 2
            continue
        if warns:
            for code, msg in warns:
                print(f"{name:28s} {code:14s} {msg}")
        else:
            print(f"{name:28s} clean")
    sys.exit(worst)


if __name__ == "__main__":
    main()
