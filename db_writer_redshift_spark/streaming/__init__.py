"""Structured Streaming extension track.

The reference is batch-only ("incremental" means batch upsert —
SURVEY.md §2.4); this package is the §7 extension: the same event
semantics expressed as streams with watermarks, windows, state, and an
exactly-once-per-batch merge sink that reuses the batch merge operator.
"""

from db_writer_redshift_spark.streaming.jobs import (  # noqa: F401
    EVENTS_SCHEMA,
    merge_sink,
    near_dup_filter_sink,
    read_csv_stream,
    read_events_stream,
    read_query_state,
    state_skew_summary,
    stream_anomaly_filter,
    stream_psi_drift,
    stream_click_purchase_join,
    stream_click_purchase_left_join,
    stream_dedup_events,
    stream_hopping_counts,
    stream_sessionize,
    stream_token_budget_gate,
    stream_tumbling_counts,
    streaming_cusum,
    streaming_ewma,
    streaming_running_totals,
)
