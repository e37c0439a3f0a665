#!/usr/bin/env python
"""Scale probe: replicate a fixture SF K× into a HEALTHY multi-file layout
and re-time headline queries there.

The shipped fixtures are single-row-group parquet — scan parallelism 1 by
construction — so sf0.1 timings measure mostly single-core decode. This
probe answers the question the fixtures can't: do the plans actually
parallelize and stay near-linear when the data grows 10× AND the layout
provides real splits (the 100 TB situation)?

Replication scheme (keys offset per copy i by a stride > max key):
  * facts (orders/lineitem) and their foreign keys to each other and to
    customer are offset — K× rows, K× distinct keys, identical per-copy
    join fan-out;
  * dimensions (region/nation/supplier/part) stay single-copy, exactly
    like a real scale-up where dims grow slower than facts;
  * documents/embeddings/events offset their ids — duplicated text is
    REALISTIC for dedup ops (K exact copies of every doc);
  * events keeps its converted micro-precision timestamps (load_table
    passes non-bigint ts through unchanged).

Usage: python tools/scale_probe.py [K] [out_dir] [--all | query ...]
  (defaults: K=10, out=/tmp/spark_graft_scale/sf1, headline PROBE list)
Writes the scaled tables once (skips if present), then prints per-query
seconds at the scaled SF vs the source SF.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

PROBE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_rank_orders_per_customer",
    "events_sessionization",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "ann_brute_force_topk",
    "text_quality_scores",
]

# per-table (offset_cols, stride) — stride chosen far above sf0.1 max keys
OFFSETS = {
    "orders": (["o_orderkey", "o_custkey"], {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}),
    "lineitem": (["l_orderkey"], {"l_orderkey": 10_000_000}),
    "customer": (["c_custkey"], {"c_custkey": 1_000_000}),
    "events": (["event_id", "user_id"], {"event_id": 10_000_000, "user_id": 1_000_000}),
    "documents": (["doc_id"], {"doc_id": 1_000_000}),
    "embeddings": (["vec_id"], {"vec_id": 1_000_000}),
}
DIMS = ["region", "nation", "supplier", "part"]


def build(spark, k: int, out: str) -> None:
    from pyspark.sql import functions as F

    from db_writer_redshift_spark.plans.registry import load_table

    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            load_table(spark, SRC, name).write.mode("overwrite").parquet(dst)
    for name, (cols, strides) in OFFSETS.items():
        dst = f"{out}/{name}.parquet"
        if os.path.exists(dst):
            continue
        base = load_table(spark, SRC, name)
        copies = []
        for i in range(k):
            c = base
            for col in cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[col]))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        # healthy layout: ~32 splits per table instead of one row group
        df.repartition(32).write.mode("overwrite").parquet(dst)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    extra = sys.argv[3:]

    from db_writer_redshift_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="scale_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    build(spark, k, out)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    if extra == ["--all"]:
        probe = sorted(queries)
    elif extra:
        probe = extra
    else:
        probe = PROBE
    print(f"{'query':40s} {'src_s':>7s} {'scaled_s':>9s} {'ratio':>6s}  (data ×{k}, 32-split layout)")
    for name in probe:
        fn = queries[name]
        print(f"{name:40s} ", end="", flush=True)
        rows = {}
        for label, sf_dir in [("src", SRC), ("scaled", out)]:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            rows[label] = best
        ratio = rows["scaled"] / rows["src"] if rows["src"] > 0 else float("nan")
        print(f"{rows['src']:7.2f} {rows['scaled']:9.2f} {ratio:5.1f}x", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
