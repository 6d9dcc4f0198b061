"""Parquet layout auditor: is this dataset shaped for 100 TB scans?

Reads footers only (pyarrow metadata — no data pages) and reports the
properties that decide scan cost:

- file count + size distribution (small-file explosion detection)
- row groups per file + rows per row group (too-small groups waste
  scheduler overhead; too-large defeat min/max skipping)
- per-column min/max coverage on a probe column (sortedness: the
  fraction of row groups a point predicate can skip — 1 - selectivity
  of the stats; ~0 for random layout, ~1 - 1/groups for sorted/zordered)

Usage:
    python tools/layout_audit.py <dir-or-glob> [probe_column]
"""

from __future__ import annotations

import glob as globmod
import json
import os
import sys

import pyarrow.parquet as pq


def audit(path: str, probe_col: str | None = None) -> dict:
    files = sorted(
        globmod.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isdir(path)
        else globmod.glob(path)
    )
    sizes = [os.path.getsize(f) for f in files]
    out: dict = {
        "files": len(files),
        "total_mb": round(sum(sizes) / 1e6, 2),
        "min_file_mb": round(min(sizes) / 1e6, 3) if sizes else None,
        "max_file_mb": round(max(sizes) / 1e6, 3) if sizes else None,
        "small_files_under_8mb": sum(s < 8e6 for s in sizes),
    }
    rg_rows: list[int] = []
    spans = []  # (min, max) per row group for the probe column
    for f in files:
        meta = pq.read_metadata(f)
        for i in range(meta.num_row_groups):
            rg = meta.row_group(i)
            rg_rows.append(rg.num_rows)
            if probe_col is not None:
                for j in range(rg.num_columns):
                    col = rg.column(j)
                    if col.path_in_schema == probe_col and col.statistics:
                        st = col.statistics
                        if st.has_min_max:
                            spans.append((st.min, st.max))
    out["row_groups"] = len(rg_rows)
    if rg_rows:
        out["rows_per_group_min"] = min(rg_rows)
        out["rows_per_group_max"] = max(rg_rows)
    if probe_col is not None:
        out["probe_column"] = probe_col
        out["groups_with_stats"] = len(spans)
        if spans:
            # skip fraction for a point predicate at the global median:
            # the share of row groups whose [min,max] EXCLUDES it
            lo = min(s[0] for s in spans)
            hi = max(s[1] for s in spans)
            try:
                mid = (lo + hi) / 2  # numeric columns
            except TypeError:
                mid = sorted([s[0] for s in spans])[len(spans) // 2]
            skipped = sum(1 for s in spans if not (s[0] <= mid <= s[1]))
            out["point_skip_fraction"] = round(skipped / len(spans), 4)
    return out


def main() -> None:
    path = sys.argv[1]
    probe = sys.argv[2] if len(sys.argv) > 2 else None
    print(json.dumps(audit(path, probe), indent=2, default=str))


if __name__ == "__main__":
    main()
