#!/usr/bin/env python
"""Round-9 measurement probe (guide §1): where do ann_lsh_topk /
dedup_embedding_lsh actually spend time at sf0.1, and how does the Arrow
bucket stage's cost scale with the partition count ensure_parallelism
picks? Times each piece repeatedly in ONE session so JVM/JIT/worker warmth
is shared; prints medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timed(label, fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: median {statistics.median(ts):.3f}s  all {[round(t,3) for t in ts]}",
          flush=True)
    return statistics.median(ts)


def main() -> int:
    from db_writer_redshift_spark.session import get_spark
    from db_writer_redshift_spark.operators import similarity
    from db_writer_redshift_spark.plans.registry import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="probe_lsh",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    emb = load_table(spark, sf_dir, "embeddings")
    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    planes = similarity._hyperplanes(64, 4, 16, 42)
    bucket_of = similarity._bucket_udf(planes)

    # -- piece 1: the Arrow bucket stage alone, at varying partition counts
    for nparts in (1, 4, 8, 32):
        src = emb.select("vec_id", "embedding").repartition(nparts)
        df = src.select(
            "vec_id", F.posexplode(bucket_of(F.col("embedding"))).alias("t", "bkt")
        )
        noop(df)  # warm
        timed(f"bucket-stage nparts={nparts}", lambda: noop(df))

    # -- piece 2: the JVM-only equivalent amount of data, same partitioning
    for nparts in (1, 32):
        src = emb.select("vec_id", "embedding").repartition(nparts)
        df = src.select("vec_id", F.posexplode(F.array(*[F.size("embedding")] * 16)).alias("t", "bkt"))
        noop(df)
        timed(f"jvm-explode nparts={nparts}", lambda: noop(df))

    # -- piece 3: full queries as registered
    import __spark_entry__ as entry
    qs = entry.queries()
    for name in ("ann_lsh_topk", "dedup_embedding_lsh"):
        fn = qs[name]
        noop(fn(spark, sf_dir))  # warm
        timed(name, lambda: (noop(fn(spark, sf_dir)), spark.catalog.clearCache()))

    # -- piece 4: candidate counts (sizes the rerank work)
    emb10 = emb.filter(F.col("vec_id") % 10 == 0)
    vecs = emb10.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("vec"))
    b = vecs.select("vid", F.posexplode(bucket_of(F.col("vec"))).alias("t", "bkt"))
    a2, b2 = b.withColumnRenamed("vid", "id_a"), b.withColumnRenamed("vid", "id_b")
    cand = (a2.join(b2, ["t", "bkt"]).filter(F.col("id_a") < F.col("id_b")))
    print("dedup_embedding cand rows (pre-dedup):", cand.count(), flush=True)
    print("dedup_embedding cand pairs (post-dedup):",
          cand.select("id_a", "id_b").dropDuplicates().count(), flush=True)

    q = emb.filter(F.col("vec_id") % 50 == 0)
    qb = q.select(F.col("vec_id").alias("query_id"),
                  F.posexplode(bucket_of(F.col("embedding"))).alias("t", "bkt"))
    cb = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.posexplode(bucket_of(F.col("embedding"))).alias("t", "bkt"))
    c2 = qb.join(cb, ["t", "bkt"]).filter(F.col("query_id") != F.col("neighbor_id"))
    print("ann_lsh cand rows (pre-dedup):", c2.count(), flush=True)
    print("ann_lsh cand pairs (post-dedup):",
          c2.select("query_id", "neighbor_id").dropDuplicates().count(), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
