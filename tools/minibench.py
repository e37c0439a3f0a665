#!/usr/bin/env python
"""A/B mini-bench: times the named queries exactly like bench.py (warm-up +
best-of-2, clearCache between) but repeats the whole cycle N times and
prints per-cycle numbers + the median — for isolating one query family's
before/after without paying a full bench run per configuration.

Usage: python tools/minibench.py [-n cycles] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    cycles = 3
    if args and args[0] == "-n":
        cycles = int(args[1])
        args = args[2:]
    names = args

    from db_writer_redshift_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="minibench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    results: dict[str, list[float]] = {n: [] for n in names}
    for cyc in range(cycles):
        for name in names:
            fn = queries[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name].append(round(best, 3))
            spark.catalog.clearCache()
    for name in names:
        r = results[name]
        print(f"{name}: median {statistics.median(r):.3f}s  cycles {r}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
