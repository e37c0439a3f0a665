#!/usr/bin/env python
"""Time EVERY registered query at a given SF with the noop sink (guide
§1.4) — the optimization round's target-finder. Single timed run per query
(cold plans, warm JVM), clearCache between queries, slowest-first summary.

Usage: python tools/registry_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/registry_sweep.json"

    from db_writer_redshift_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="registry_sweep",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    for i, (name, fn) in enumerate(queries.items()):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"[sweep] {name}: ERROR {exc}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        print(f"[sweep] {i + 1}/{len(queries)} {name}: {timings[name]}s",
              file=sys.stderr, flush=True)

    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "timings": timings}, f, indent=1, sort_keys=True)
    print("\nslowest 30:")
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {sec:7.3f}s  {name}")
    print(f"total {sum(t for t in timings.values() if t > 0):.1f}s over {len(timings)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
