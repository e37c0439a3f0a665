#!/usr/bin/env python
"""Runnable streaming smoke (out-of-harness by design — the driver's
correctness gate compares batch DataFrames, so streaming parity is
proven here and in tests/test_streaming.py instead): replay the events
table as file-source micro-batches and check the streamed result equals
the batch answer on the same data.

    python examples/streaming/run.py [sf_dir] [work_dir]

Defaults: sf_dir=/root/testdata/sf0.001, work_dir=/tmp/streaming_smoke.
Pipeline: events.parquet -> 4 arrival files -> readStream (availableNow)
-> 1h tumbling counts -> memory sink (complete mode, so the final
micro-batch emits every window including those the watermark has not
closed), asserted equal to the identical batch aggregation.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import functions as F  # noqa: E402

from db_writer_redshift_spark.session import get_spark  # noqa: E402
from db_writer_redshift_spark.plans.registry import load_table  # noqa: E402
from db_writer_redshift_spark.streaming import (  # noqa: E402
    read_events_stream,
    stream_tumbling_counts,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/streaming_smoke"
    spark = get_spark(app_name="streaming-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(work, ignore_errors=True)
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals)

    # Replay the batch table as 4 "arrival" files (micro-batches).
    # load_table converts the TIMESTAMP(NANOS) column exactly like the
    # batch queries see it, so stream and batch read identical values.
    events = load_table(spark, sf_dir, "events")
    staged = os.path.join(work, "staged")
    events.repartition(4).write.parquet(staged)
    for i, f in enumerate(sorted(glob.glob(os.path.join(staged, "*.parquet")))):
        shutil.copy(f, os.path.join(arrivals, f"arrival_{i}.parquet"))

    # (cross-batch dedup chains a second watermark — its replay test lives
    # in tests/test_streaming.py; event_ids are unique in this table)
    stream = read_events_stream(spark, arrivals, max_files_per_trigger=1)
    counts = stream_tumbling_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("smoke_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.table("smoke_counts")
    want = (
        events
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    n_got, n_want = got.count(), want.count()
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    print(f"stream rows={n_got} batch rows={n_want} symmetric_diff={diff}")
    if diff or n_got != n_want:
        print("MISMATCH between streamed and batch results")
        return 1
    print("OK: streamed tumbling counts equal the batch aggregation")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
