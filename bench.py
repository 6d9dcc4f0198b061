"""Benchmark runner: executes the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the wall-clock total across all queries (one shared session;
per-query numbers include plan build + execution, forced via a count-style
action so the timing measures the engine, not result serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from wp_motor_spark.queries import QUERIES
    from wp_motor_spark.session import get_spark

    spark = get_spark(app_name="wp_motor_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path so query 1 doesn't absorb session startup.
    next(iter(QUERIES.values()))[0](spark, sf_dir).limit(1).count()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # force full execution; cheap result channel (count of all rows)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
