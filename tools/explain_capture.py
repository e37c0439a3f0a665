#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/r08/<q>_<tag>.txt.

Usage: python tools/explain_capture.py <tag> [sf_dir] [query ...]
  tag: 'before' or 'after' (file suffix). Default queries: bench HEADLINE.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "plans", "r08"),
)


def main() -> int:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    import bench

    names = [a for a in rest if not os.path.isdir(a)] or bench.HEADLINE

    from db_writer_redshift_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="explain_capture",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUTDIR, exist_ok=True)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(OUTDIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
