"""Streaming tests: file-source micro-batches driven with availableNow,
results landed in memory sinks / managed tables.

Data is synthesized events-shaped parquet (two "arrival" files to force
multiple micro-batches on the dedup/merge paths).
"""

from __future__ import annotations

import datetime as dt

import pytest

from db_writer_redshift_spark.streaming import (
    EVENTS_SCHEMA,
    merge_sink,
    read_events_stream,
    stream_dedup_events,
    stream_sessionize,
    stream_hopping_counts,
    stream_tumbling_counts,
    streaming_running_totals,
)

try:  # transformWithStateInPandas' state protocol needs protobuf
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

T0 = dt.datetime(2025, 3, 1, 10, 0, 0)


def _mk(eid, minutes, uid, etype="click", value=1.0):
    return (eid, T0 + dt.timedelta(minutes=minutes), uid, etype, value, "{}")


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Two parquet arrival files → two micro-batches."""
    from db_writer_redshift_spark.session import get_spark

    spark = get_spark()
    d = tmp_path_factory.mktemp("events_stream")
    batch1 = [
        _mk(1, 0, 100),
        _mk(2, 5, 100),
        _mk(3, 90, 100),  # new session for user 100 (gap > 30m)
        _mk(4, 2, 200, "view", 2.5),
    ]
    batch2 = [
        _mk(4, 2, 200, "view", 2.5),  # duplicate event_id across batches
        _mk(5, 95, 200, "click", 4.0),
    ]
    spark.createDataFrame(batch1, EVENTS_SCHEMA).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(batch2, EVENTS_SCHEMA).coalesce(1).write.parquet(str(d / "b2"))
    # file source wants a flat dir of files
    flat = tmp_path_factory.mktemp("events_flat")
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(str(d / "b*" / "*.parquet")))):
        shutil.copy(f, flat / f"arrival_{i}.parquet")
    return str(flat)


def _run_to_memory(spark, df, name, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    # Stateless availableNow queries terminate on their own; the
    # applyInPandasWithState jobs with processing-time timeouts keep
    # scheduling timer batches and never do (the old unchecked
    # awaitTermination(120) silently burned 2 minutes per test on them,
    # and processAllAvailable() blocks forever on the timer loop). Poll
    # for a drained source instead: termination, or any committed batch
    # with zero input rows (timer/idle batches run only after the file
    # source is exhausted) — and fail LOUDLY on timeout or stream error.
    import time

    deadline = time.time() + 300
    drained = False
    while time.time() < deadline:
        if q.exception() is not None:
            raise q.exception()
        if not q.isActive:
            drained = True
            break
        if any(p["numInputRows"] == 0 for p in q.recentProgress):
            drained = True
            break
        time.sleep(1)
    assert drained, "stream did not drain its source within 300s"
    q.stop()
    return spark.table(name)


@pytest.mark.slow
def test_stream_tumbling_counts(spark, events_dir, tmp_path):
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    # complete mode: finite test stream ends before the watermark would
    # close the final windows, so append would emit nothing for them
    out = _run_to_memory(
        spark, stream_tumbling_counts(src, "1 hour"), "t_tumble", tmp_path, mode="complete"
    )
    rows = {(r.window_start.hour, r.event_type): r.n_events for r in out.collect()}
    # hour 10: 3 clicks (e1,e2 user100 + dup-counted e4? e4 is view) …
    assert rows[(10, "click")] == 2
    assert rows[(10, "view")] == 2  # e4 arrives once per batch
    assert rows[(11, "click")] == 2  # e3 @ +90m, e5 @ +95m


@pytest.mark.slow
def test_stream_hopping_counts_overlap(spark, events_dir, tmp_path):
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _run_to_memory(
        spark,
        stream_hopping_counts(src, "1 hour", "30 minutes"),
        "t_hop",
        tmp_path,
        mode="complete",
    )
    rows = out.collect()
    # overlap invariant: every event belongs to exactly window/slide = 2
    # overlapping windows, so per event_type the hopping totals are exactly
    # double the tumbling totals; window starts align to the 30-min slide
    from collections import defaultdict

    per_type = defaultdict(int)
    for r in rows:
        per_type[r.event_type] += r.n_events
    tum = _run_to_memory(
        spark, stream_tumbling_counts(src, "1 hour"), "t_hop_ref", tmp_path, mode="complete"
    )
    per_type_tum = defaultdict(int)
    for r in tum.collect():
        per_type_tum[r.event_type] += r.n_events
    assert per_type == {k: 2 * v for k, v in per_type_tum.items()}
    # and window starts are 30-minute aligned
    assert all(r.window_start.minute in (0, 30) for r in rows)


def test_stream_sessionize_gap_split(spark, events_dir, tmp_path):
    src = read_events_stream(spark, events_dir)
    out = _run_to_memory(
        spark, stream_sessionize(src, "30 minutes"), "t_sess", tmp_path, mode="complete"
    )
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[100]) == [1, 2]  # 2-event session + the +90m single
    assert 200 in per_user


@pytest.mark.slow
def test_stream_dedup_across_batches(spark, events_dir, tmp_path):
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _run_to_memory(spark, stream_dedup_events(src), "t_dedup", tmp_path)
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3, 4, 5]  # duplicate e4 dropped by state


@pytest.mark.slow
def test_streaming_running_totals_state(spark, events_dir, tmp_path):
    src = read_events_stream(spark, events_dir)
    out = _run_to_memory(
        spark, streaming_running_totals(src), "t_state", tmp_path, mode="update"
    )
    latest = {r.user_id: (r.n_events, r.sum_value) for r in out.collect()}
    assert latest[100] == (3, 3.0)
    assert latest[200] == (3, 9.0)  # dup e4 counted twice + e5


def test_merge_sink_idempotent_upsert(spark, events_dir, tmp_path):
    from db_writer_redshift_spark.operators import catalog

    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    try:
        q = merge_sink(src, "events_merged", ["event_id"], str(tmp_path / "ck_merge")).trigger(
            availableNow=True
        ).start()
        assert q.awaitTermination(300), "stream timed out"
        got = spark.table("events_merged")
        assert got.count() == 5  # e4 upserted, not duplicated
        assert sorted(r.event_id for r in got.collect()) == [1, 2, 3, 4, 5]
    finally:
        catalog.drop_table(spark, "events_merged")


@pytest.mark.slow
def test_merge_sink_survives_orphan_staging_table(spark, events_dir, tmp_path):
    """Crash-recovery regression (round-2 ADVICE): a previous run that
    died between the staging write and its drop leaves parquet at a
    staging location. The sink must not wedge on it (unique per-batch
    staging names + location-cleaning overwrite), and the leftover must
    never surface as a user table in listings."""
    from db_writer_redshift_spark.operators import catalog

    # Simulate the crash artifact: orphan parquet at a _temp_ location
    # of the target's staging-name scheme, with NO catalog entry (the
    # crashed session's in-memory catalog died with it).
    orphan = "events_merged2_temp_deadbeef01"
    wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.range(3).write.mode("overwrite").parquet(
        wh.rstrip("/") + "/" + orphan
    )
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    try:
        q = (
            merge_sink(
                src, "events_merged2", ["event_id"], str(tmp_path / "ck_merge2")
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out"
        got = spark.table("events_merged2")
        assert sorted(r.event_id for r in got.collect()) == [1, 2, 3, 4, 5]
        # the staging leftover is invisible to listings (tmp-name scheme)
        assert orphan not in catalog.show_tables(spark)
        # and no _temp_ staging tables leak from the successful batches
        assert not [t for t in spark.catalog.listTables() if "_temp_" in t.name]
    finally:
        catalog.drop_table(spark, "events_merged2")
        catalog.drop_table(spark, orphan)


def test_csv_stream_same_dialect(spark, tmp_path):
    """CSV files dropped into a watched dir stream through with the pinned
    dialect intact (quote-doubling survives)."""
    from pyspark.sql import types as T

    from db_writer_redshift_spark.streaming import read_csv_stream

    d = tmp_path / "incoming"
    d.mkdir()
    (d / "a.csv").write_text('id,txt\n1,"quote "" in"\n2,NULL\n')
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("txt", T.StringType())]
    )
    q = (
        read_csv_stream(spark, str(d), schema)
        .writeStream.format("memory")
        .queryName("t_csv_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"
    rows = {r.id: r.txt for r in spark.table("t_csv_stream").collect()}
    assert rows == {1: 'quote " in', 2: None}


def test_stream_anomaly_filter_static_join(spark, events_dir, tmp_path):
    """Stream-static join flags only the >3-sigma values, statelessly."""
    from db_writer_redshift_spark.streaming import stream_anomaly_filter

    stats = spark.createDataFrame(
        [("click", 1.0, 0.5), ("view", 2.5, 1.0)],
        "event_type string, mean double, std double",
    )
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _run_to_memory(
        spark, stream_anomaly_filter(src, stats, sigmas=3.0), "t_anom", tmp_path
    )
    rows = {(r.event_id, round(r.zscore, 2)) for r in out.collect()}
    # click values are 1.0 except event 5 (4.0 → z=6); views sit at mean
    assert rows == {(5, 6.0)}


@pytest.mark.slow
def test_stream_stream_click_purchase_interval_join(spark, tmp_path):
    """Stream-stream inner interval join: purchases land on the click
    within the window; out-of-window purchases drop; both sides
    watermarked so join state is bounded."""
    from db_writer_redshift_spark.streaming import stream_click_purchase_join

    rows = [
        _mk(1, 0, 100, "click"),
        _mk(2, 30, 100, "purchase", 9.0),   # within 1h of click 1 -> match
        _mk(3, 0, 200, "click"),
        _mk(4, 120, 200, "purchase", 5.0),  # 2h after click 3 -> no match
        _mk(5, 10, 300, "purchase", 1.0),   # purchase with no click
    ]
    src = tmp_path / "src"
    from db_writer_redshift_spark.streaming import EVENTS_SCHEMA as ES

    spark.createDataFrame(rows, ES).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(ES).parquet(str(src))
    )
    out = stream_click_purchase_join(stream, stream, within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("cp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"
    got = {
        (r.click_id, r.purchase_id, r.latency_us)
        for r in spark.sql("SELECT * FROM cp_join").collect()
    }
    assert got == {(1, 2, 30 * 60 * 1_000_000)}


@pytest.mark.slow
def test_scd2_sink_accumulates_history(spark, tmp_path):
    from db_writer_redshift_spark.operators import catalog
    from db_writer_redshift_spark.streaming.jobs import scd2_sink

    d = tmp_path / "dim_stream"
    d.mkdir()
    spark.createDataFrame([(1, "A"), (2, "B")], "k int, seg string").coalesce(
        1
    ).write.parquet(str(d / "s0"))
    spark.createDataFrame([(1, "A2"), (3, "C")], "k int, seg string").coalesce(
        1
    ).write.parquet(str(d / "s1"))
    import glob
    import shutil

    flat = tmp_path / "dim_flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "s*" / "*.parquet")))):
        shutil.copy(f, flat / f"arrival_{i}.parquet")

    src = (
        spark.readStream.schema("k int, seg string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    try:
        q = (
            scd2_sink(src, "dim_scd2", ["k"], ["seg"], str(tmp_path / "ck_scd2"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out"
        got = {
            (r.k, r.valid_from): (r.seg, r.valid_to, r.is_current)
            for r in spark.table("dim_scd2").collect()
        }
        assert got == {
            (1, 0): ("A", 1, False),
            (1, 1): ("A2", None, True),
            (2, 0): ("B", None, True),  # unmentioned in batch 1: stays open
            (3, 1): ("C", None, True),
        }
    finally:
        catalog.drop_table(spark, "dim_scd2")


def test_incremental_agg_sink_matches_batch_aggregate(spark, events_dir, tmp_path):
    from db_writer_redshift_spark.operators import catalog
    from db_writer_redshift_spark.streaming.jobs import incremental_agg_sink

    state = {
        "n": ("*", "count"),
        "total_value": ("value", "sum"),
        "max_value": ("value", "max"),
    }
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    try:
        q = (
            incremental_agg_sink(
                src, "events_summary", ["user_id"], state, str(tmp_path / "ck_iagg")
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out"
        got = {
            r.user_id: (r.n, r.total_value, r.max_value)
            for r in spark.table("events_summary").collect()
        }
        # batch ground truth over ALL arrival files (e4 appears twice: the
        # stream is at-least-once; combinable state counts both deliveries)
        batch = (
            spark.read.parquet(events_dir)
            .groupBy("user_id")
            .count()
        )
        assert set(got) == {r.user_id for r in batch.collect()}
        assert got[100][0] == 3  # events 1,2,3
        assert got[200][0] == 3  # events 4 (x2 deliveries), 5
    finally:
        catalog.drop_table(spark, "events_summary")


@pytest.mark.slow
def test_near_dup_filter_sink_first_seen_wins(spark, tmp_path):
    """Streaming MinHash-LSH curation: batch-2 near-copy of a batch-1 doc
    is dropped (store collision), intra-batch near-copies keep the min id,
    distinct docs pass; a full replay (fresh checkpoint, same source)
    leaves the corpus unchanged (batch_id-partitioned dynamic overwrite)."""
    from pyspark.sql import types as T

    from db_writer_redshift_spark.streaming import near_dup_filter_sink

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    other = (
        "completely different content about spark query engines and "
        "distributed hash joins over very large partitioned tables"
    )
    third = (
        "yet another unrelated document discussing streaming watermarks "
        "state stores and exactly once processing semantics in pipelines"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src_dir = tmp_path / "docs_src"
    src_dir.mkdir()
    b1 = [(1, base), (2, other)]
    # 3 = near-copy of 1 (crosses batches); 5 = near-copy of 4 (intra-batch)
    b2 = [(3, base + " extra"), (4, third), (5, third + " tail")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(tmp_path / "w1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(tmp_path / "w2"))
    import glob
    import shutil

    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "w1" / "*.parquet")))
        + sorted(glob.glob(str(tmp_path / "w2" / "*.parquet")))
    ):
        shutil.copy(f, src_dir / f"arrival_{i}.parquet")

    corpus = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")

    def run(ck: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            near_dup_filter_sink(stream, corpus, bands, str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out"

    run("ck1")
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()
    )
    assert kept == [1, 2, 4], kept

    run("ck2")  # replay everything from scratch
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()
    )
    assert kept2 == [1, 2, 4], kept2
    # the store holds bucket rows only for admitted docs
    store_docs = sorted(
        r["doc_id"]
        for r in spark.read.parquet(bands).select("doc_id").distinct().collect()
    )
    assert store_docs == [1, 2, 4], store_docs


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas needs google.protobuf (absent here)",
)
def test_stream_token_budget_gate_lifetime_budget(spark, tmp_path):
    """transformWithStateInPandas gate: admission stops when a source's
    LIFETIME token total would exceed the budget, and the persisted total
    carries across micro-batches (doc 5 in batch 2 is rejected because
    batch 1 already consumed most of src-a's budget; src-b is unaffected)."""
    from pyspark.sql import types as T

    from db_writer_redshift_spark.streaming import stream_token_budget_gate

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    b1 = [(1, "a", 40), (2, "a", 50), (3, "b", 10)]
    # a: used=90 of 100 -> doc 4 (20) rejected, doc 5 (10) admitted (90+10<=100)
    # b: used=10 -> doc 6 (95) would reach 105 > 100 -> rejected
    b2 = [(4, "a", 20), (5, "a", 10), (6, "b", 95)]
    src_dir = tmp_path / "docs"
    src_dir.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(tmp_path / "w1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(tmp_path / "w2"))
    import glob
    import shutil

    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "w1" / "*.parquet")))
        + sorted(glob.glob(str(tmp_path / "w2" / "*.parquet")))
    ):
        shutil.copy(f, src_dir / f"arrival_{i}.parquet")

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        gated = stream_token_budget_gate(stream, budget_tokens=100)
        q = (
            gated.writeStream.format("memory")
            .queryName("budget_gate")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out"
        rows = {
            r["doc_id"]: (r["source"], r["n_tokens"], r["used_after"])
            for r in spark.sql("SELECT * FROM budget_gate").collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    assert set(rows) == {1, 2, 3, 5}, rows  # 4 and 6 would blow their budgets
    assert rows[2] == ("a", 50, 90)
    assert rows[5] == ("a", 10, 100)  # lifetime total resumed across batches
    assert rows[3] == ("b", 10, 10)


def test_budget_gate_processor_logic_with_fake_state():
    """Unit-level admission contract of BudgetGateProcessor (no streaming
    runtime needed): deterministic doc_id order, skip-too-big-keep-smaller,
    lifetime total persisted across calls via the (fake) ValueState."""
    import pandas as pd

    from db_writer_redshift_spark.streaming.jobs import BudgetGateProcessor

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema):
            return self.state

    p = BudgetGateProcessor(100)
    h = FakeHandle()
    p.init(h)

    def run(rows):
        out = list(
            p.handleInputRows(
                ("a",),
                iter([pd.DataFrame(rows, columns=["doc_id", "n_tokens"])]),
                None,
            )
        )
        return [tuple(r) for r in out[0].itertuples(index=False)] if out else []

    # batch 1: 40 + 50 admitted (out-of-order input is sorted by doc_id)
    got1 = run([(2, 50), (1, 40)])
    assert got1 == [("a", 1, 40, 40), ("a", 2, 50, 90)]
    # batch 2: 20 would blow the budget -> skipped; 10 still fits (=100)
    got2 = run([(4, 20), (5, 10)])
    assert got2 == [("a", 5, 10, 100)]
    assert h.state.get() == (100,)
    # batch 3: budget exhausted -> nothing emitted, state unchanged
    assert run([(6, 1)]) == []
    assert h.state.get() == (100,)


@pytest.mark.slow
def test_streaming_ewma_matches_sequential_fold(spark, events_dir, tmp_path):
    """The stateful streaming EWMA must equal the same fold computed over
    each user's history in PROCESSING order (micro-batch arrival order,
    (ts, event_id)-sorted within each batch) — state carries across
    micro-batches (one file per trigger)."""
    import glob

    from db_writer_redshift_spark.streaming import streaming_ewma

    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _run_to_memory(
        spark, streaming_ewma(src), "t_ewma", tmp_path, mode="update"
    )
    latest = {r.user_id: (r.n_events, r.ewma_value) for r in out.collect()}

    by_user: dict[int, tuple[int, float]] = {}
    for pth in sorted(glob.glob(events_dir + "/*.parquet")):
        batch = spark.read.schema(EVENTS_SCHEMA).parquet(pth).collect()
        for r in sorted(batch, key=lambda r: (r.ts, r.event_id)):
            n, e = by_user.get(r.user_id, (0, 0.0))
            x = float(r.value)
            e = x if n == 0 else e * 0.75 + x * 0.25
            by_user[r.user_id] = (n + 1, e)
    expected = {u: (n, round(e, 6)) for u, (n, e) in by_user.items()}
    assert latest == expected


@pytest.mark.slow
def test_streaming_cusum_matches_integer_model(spark, events_dir, tmp_path):
    """The stateful streaming CUSUM must equal the closed-form integer
    model replayed in processing order against static per-type targets."""
    import glob

    from db_writer_redshift_spark.streaming import streaming_cusum

    targets = spark.createDataFrame(
        [("click", 1_500_000), ("view", 2_000_000)], "event_type string, mean_e6 long"
    )
    src = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _run_to_memory(
        spark, streaming_cusum(src, targets), "t_cusum", tmp_path, mode="update"
    )
    latest = {
        (r.user_id, r.event_type): (r.n_events, r.peak_cusum_e6, r.cusum_e6)
        for r in out.collect()
    }

    means = {"click": 1_500_000, "view": 2_000_000}
    st: dict[tuple[int, str], list[int]] = {}
    for pth in sorted(glob.glob(events_dir + "/*.parquet")):
        batch = spark.read.schema(EVENTS_SCHEMA).parquet(pth).collect()
        for r in sorted(batch, key=lambda r: (r.ts, r.event_id)):
            k = (r.user_id, r.event_type)
            n, p, minp, peak = st.get(k, [0, 0, 0, 0])
            p += round(float(r.value) * 1_000_000) - means[r.event_type]
            minp = min(minp, p)
            cur = p - min(0, minp)
            peak = max(peak, cur)
            st[k] = [n + 1, p, minp, peak]
    expected = {
        k: (n, peak, p - min(0, minp)) for k, (n, p, minp, peak) in st.items()
    }
    assert latest == expected
    # drift really registers: user 200's 4.0-value click sits far above
    # the 1.5 click target
    assert latest[(200, "click")][1] > 0


def test_cdc_retraction_agg_sink_applies_deletes(spark, tmp_path):
    """Signed-multiplicity CDC stream: two micro-batches of +1/-1 rows
    leave exactly the from-scratch view over the surviving logical set;
    a fully-retracted group drops from the maintained table."""
    from decimal import Decimal

    from db_writer_redshift_spark.operators import catalog
    from db_writer_redshift_spark.streaming.jobs import cdc_retraction_agg_sink

    import glob
    import shutil

    raw = tmp_path / "cdc_raw"
    src_dir = tmp_path / "cdc_src"
    src_dir.mkdir()
    batch1 = spark.createDataFrame(
        [
            ("a", Decimal("1.50"), 1),
            ("a", Decimal("2.25"), 1),
            ("b", Decimal("10.00"), 1),
        ],
        "g string, v decimal(18,4), mult long",
    )
    batch1.coalesce(1).write.parquet(str(raw / "b1"))
    batch2 = spark.createDataFrame(
        [
            ("a", Decimal("1.50"), -1),   # delete
            ("b", Decimal("10.00"), -1),  # full retraction of b
            ("c", Decimal("7.00"), 1),    # new group
        ],
        "g string, v decimal(18,4), mult long",
    )
    batch2.coalesce(1).write.parquet(str(raw / "b2"))
    # file source wants a flat dir of files, in arrival order
    for i, f in enumerate(sorted(glob.glob(str(raw / "b*" / "*.parquet")))):
        shutil.copy(f, src_dir / f"arrival_{i}.parquet")
    stream = (
        spark.readStream.schema("g string, v decimal(18,4), mult long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    try:
        q = (
            cdc_retraction_agg_sink(
                stream,
                "cdc_view",
                keys=["g"],
                mult_col="mult",
                sums={"sv": "v"},
                checkpoint_dir=str(tmp_path / "ck_cdc"),
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out"
        got = {r.g: (r.n_rows, r.sv) for r in spark.table("cdc_view").collect()}
        assert got == {
            "a": (1, Decimal("2.2500")),
            "c": (1, Decimal("7.0000")),
        }
    finally:
        catalog.drop_table(spark, "cdc_view")


@pytest.mark.slow
def test_stream_psi_drift_matches_exact_replay(spark, tmp_path):
    """The streaming PSI monitor's per-window, per-bucket terms equal an
    exact Python replay of the same formula on the same rows — windowed
    state is one histogram row per window, emitted on watermark close
    (availableNow finalizes every window)."""
    import math

    from db_writer_redshift_spark.streaming import stream_psi_drift

    # two 1-hour windows with visibly different value distributions
    rows = []
    eid = 0
    for m in range(0, 30):  # window A: values low
        rows.append(_mk(eid, m, 100, "click", float(m % 3)))
        eid += 1
    for m in range(60, 90):  # window B: values high
        rows.append(_mk(eid, m, 100, "click", 6.0 + float(m % 4)))
        eid += 1
    # flush row: advances the watermark past window B's end so append
    # mode finalizes it; its own window stays open and is not asserted
    flush = _mk(eid, 600, 100, "click", 0.0)
    src = tmp_path / "psi_src"
    spark.createDataFrame(rows + [flush], EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    )
    baseline = [20, 10, 10, 10, 5, 5, 10, 10, 10, 10]  # any positive ref
    lo, hi = 0.0, 9.0
    out = _run_to_memory(
        spark,
        stream_psi_drift(stream, baseline, lo, hi, window="1 hour",
                         watermark="10 minutes"),
        "t_psi",
        tmp_path,
    ).collect()
    assert out, "no finalized windows"

    # exact replay
    nb, q_tot = len(baseline), sum(baseline)
    hist: dict[tuple[int, int], int] = {}
    for r in rows:
        ws = r[1].replace(minute=0, second=0, microsecond=0)
        ws_us = int(ws.timestamp() * 1_000_000)
        b = min(int((r[4] - lo) * nb / (hi - lo + 1e-12)), nb - 1)
        b = max(b, 0)
        hist[(ws_us, b)] = hist.get((ws_us, b), 0) + 1
    totals: dict[int, int] = {}
    for (ws_us, _), n in hist.items():
        totals[ws_us] = totals.get(ws_us, 0) + n
    expected = {}
    for (ws_us, b), n in hist.items():
        if baseline[b] <= 0:
            continue
        p = n / totals[ws_us]
        q = baseline[b] / q_tot
        expected[(ws_us, b)] = (
            n,
            totals[ws_us],
            round(1_000_000_000.0 * (p - q) * math.log(p / q)),
        )
    got = {
        (r.window_start_us, r.bucket): (r.n_win, r.win_tot, r.psi_term_e9)
        for r in out
    }
    assert got == expected
    # drifted window B must alert: its |PSI| sum far exceeds window A's
    by_win = {}
    for (ws_us, _), (_, _, term) in got.items():
        by_win[ws_us] = by_win.get(ws_us, 0) + abs(term)
    assert len(by_win) == 2 and max(by_win.values()) > 250_000_000


@pytest.mark.slow
def test_state_store_reader_inspects_window_state(spark, tmp_path):
    """Spark 4's statestore reader opens a finished query's checkpoint
    and returns exactly the window state the aggregation kept: one row
    per (window, event_type) still inside the watermark horizon, with
    counts matching the input — plus the per-partition skew census."""
    from db_writer_redshift_spark.streaming import (
        read_query_state,
        state_skew_summary,
    )

    rows = [_mk(i, i * 7, 100 + i % 3, "click", 1.0) for i in range(20)]
    src = tmp_path / "ssr_src"
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(src))
    from pyspark.sql import functions as F

    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    ck = str(tmp_path / "ssr_ck")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_ssr")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = read_query_state(spark, ck)
    got = {
        (r.key.window.start.isoformat(), r.key.event_type): r.value["count"]
        for r in state.collect()
    }
    # replay: 20 events at 7-minute spacing -> per-hour counts
    expected: dict[tuple[str, str], int] = {}
    for r in rows:
        ws = r[1].replace(minute=0, second=0, microsecond=0)
        key = (ws.isoformat(), "click")
        expected[key] = expected.get(key, 0) + 1
    assert got == expected

    census = {r.partition_id: r.n_state_rows for r in
              state_skew_summary(state).collect()}
    assert sum(census.values()) == len(expected)


@pytest.mark.slow
def test_stream_stream_left_join_emits_unmatched_on_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: the unmatched click emits with
    NULL purchase columns — but only after the watermark proves no
    matching purchase can still arrive (sentinel batches advance it,
    and the eviction happens in a subsequent micro-batch)."""
    import os

    from db_writer_redshift_spark.streaming import (
        EVENTS_SCHEMA as ES,
        stream_click_purchase_left_join,
    )

    src = tmp_path / "src_left"
    src.mkdir()
    batches = [
        [
            _mk(1, 0, 100, "click"),
            _mk(2, 30, 100, "purchase", 9.0),   # within 1h -> match
            _mk(3, 0, 200, "click"),
            _mk(4, 120, 200, "purchase", 5.0),  # 2h later -> NO match
        ],
        # sentinels advance both side watermarks far past the data
        [_mk(90, 14_400, 999, "click")],
        [_mk(91, 14_460, 999, "purchase", 1.0)],
        [_mk(92, 14_520, 999, "purchase", 1.0)],
    ]
    for i, rows in enumerate(batches):
        f = src / f"b{i}"
        spark.createDataFrame(rows, ES).coalesce(1).write.parquet(str(f))
        for p in f.glob("*.parquet"):
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    flat = tmp_path / "flat_left"
    flat.mkdir()
    import glob as _g
    import shutil as _sh

    for i, f in enumerate(sorted(_g.glob(str(src / "b*" / "*.parquet")))):
        dst = flat / f"arrival_{i}.parquet"
        _sh.copy(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(ES)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out = stream_click_purchase_left_join(stream, stream, within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("cp_left_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"
    got = {
        (r.click_id, r.purchase_id, r.latency_us)
        for r in spark.sql(
            "SELECT * FROM cp_left_join WHERE user_id < 900"
        ).collect()
    }
    # click 1 matches purchase 2; click 3 emits the NULL row
    assert got == {(1, 2, 30 * 60 * 1_000_000), (3, None, None)}


@pytest.mark.slow
def test_left_join_stream_equals_batch_twin_on_real_data(spark, tmp_path):
    """The registered batch twin (streaming_left_join_batch_twin) is
    exactly what the stream converges to on the real sf0.001 events
    once sentinels drain the watermark — per-user counts and latency
    sums equal row for row."""
    import os

    import pytest as _pytest

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        _pytest.skip(f"testdata missing: {sf}")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from db_writer_redshift_spark.plans.registry import load_table
    from db_writer_redshift_spark.streaming import (
        stream_click_purchase_left_join,
    )

    ev = load_table(spark, sf, "events").select(
        "event_id",
        F.col("ts").cast("timestamp_ltz").alias("ts"),  # watermark needs LTZ
        "user_id",
        "event_type",
        "value",
        "props",
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as _dt

    flat = tmp_path / "flat_real"
    flat.mkdir()
    ev.coalesce(1).write.parquet(str(flat / "base"))
    schema = spark.read.parquet(str(flat / "base")).schema
    sent = [
        (9_000_001, mx + _dt.timedelta(days=10), 999_999, "click", 1.0, "{}"),
        (9_000_002, mx + _dt.timedelta(days=10, hours=2), 999_999, "purchase", 1.0, "{}"),
        (9_000_003, mx + _dt.timedelta(days=10, hours=3), 999_999, "purchase", 1.0, "{}"),
    ]
    files = sorted(flat.glob("base/*.parquet"))
    arrivals = []
    for i, s in enumerate(sent):
        d = flat / f"s{i}"
        spark.createDataFrame([s], schema).coalesce(1).write.parquet(str(d))
        arrivals.append(sorted(d.glob("*.parquet"))[0])
    stage = tmp_path / "stage_real"
    stage.mkdir()
    import shutil as _sh

    ordered = [files[0]] + arrivals
    for i, f in enumerate(ordered):
        dst = stage / f"arrival_{i}.parquet"
        _sh.copy(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    out = stream_click_purchase_left_join(stream, stream, within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("cp_left_twin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream timed out"
    stream_agg = {
        r.user_id: (r.n_clicks, r.n_matched_pairs, r.n_unmatched, r.lat_sum)
        for r in spark.sql(
            """
            SELECT user_id,
                   COUNT(DISTINCT click_id) AS n_clicks,
                   COUNT(purchase_id) AS n_matched_pairs,
                   COUNT(DISTINCT CASE WHEN purchase_id IS NULL
                                       THEN click_id END) AS n_unmatched,
                   SUM(latency_us) AS lat_sum
            FROM cp_left_twin WHERE user_id < 900000
            GROUP BY user_id
            """
        ).collect()
    }
    twin = {
        r.user_id: (
            r.n_clicks,
            r.n_matched_pairs,
            r.n_unmatched_clicks,
            r.latency_us_sum,
        )
        for r in entry_mod.queries()["streaming_left_join_batch_twin"](
            spark, sf
        ).collect()
    }
    assert stream_agg == twin
