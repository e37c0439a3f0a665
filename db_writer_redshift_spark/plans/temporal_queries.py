"""As-of and range join queries over the events stream table.

These cover the two temporal join shapes Spark has no built-in operator
for (SURVEY.md custom-operator track); both implementations are
compositions of DataFrame ops (operators/temporal.py) and both are
oracle-checked — DuckDB has native ASOF JOIN and inequality joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_writer_redshift_spark.operators.temporal import asof_join, range_join_days
from db_writer_redshift_spark.plans.registry import load_table, register


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right side for both joins: purchase events, deduped per
    (user_id, ts) with a max-event_id tiebreak so as-of matches are
    deterministic in both engines."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )


@register(
    "asof_join_purchase_attribution",
    oracle="""
WITH p AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
l AS (
  SELECT event_id, user_id, ts, event_type FROM events WHERE event_type <> 'purchase'
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.event_type,
       p.purchase_event_id, epoch_us(p.ts) AS purchase_ts_us
FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
""",
)
def asof_join_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach each non-purchase event to the user's most
    recent purchase at-or-before it (left-outer; NULL before the first).

    Implementation is the union+window composition (operators/temporal.py)
    — one shuffle on user_id, no inequality join. Oracle: DuckDB's native
    ASOF LEFT JOIN. Timestamps are hashed as BIGINT epoch-micros (the
    events_sessionization rule: naive-timestamp columns flap in the
    driver's canonicalizer)."""
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    right = _purchases(spark, sf_dir).select(
        "user_id", "ts", "purchase_event_id", F.col("ts").alias("purchase_ts")
    )
    joined = asof_join(
        left,
        right,
        on="ts",
        by=["user_id"],
        right_cols=["purchase_event_id", "purchase_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
        "event_type",
        "purchase_event_id",
        F.unix_micros(F.col("purchase_ts").cast("timestamp_ltz")).alias("purchase_ts_us"),
    )


@register(
    "range_join_purchase_window",
    oracle="""
WITH p AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id AS click_event_id, c.user_id, epoch_us(c.ts) AS click_ts_us,
       p.purchase_event_id
FROM events c JOIN p
  ON c.user_id = p.user_id
 AND c.ts >= p.ts
 AND c.ts <= p.ts + INTERVAL 2 DAY
WHERE c.event_type = 'click'
""",
)
def range_join_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks landing inside a 2-day window after any purchase
    by the same user (one output row per qualifying (click, window) pair).

    Day-bucket blocking (operators/temporal.py) turns the inequality join
    into an equi-join on (user_id, day); Catalyst alone would pick
    BroadcastNestedLoopJoin for the raw BETWEEN predicate."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    windows = _purchases(spark, sf_dir).select(
        "user_id",
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("p_end"),
        "purchase_event_id",
    )
    return range_join_days(
        clicks, windows, "click_ts", "p_start", "p_end", keys=["user_id"]
    ).select(
        "click_event_id",
        "user_id",
        F.unix_micros(F.col("click_ts").cast("timestamp_ltz")).alias("click_ts_us"),
        "purchase_event_id",
    )


@register(
    "events_funnel_click_purchase",
    oracle="""
WITH first_click AS (
  SELECT user_id, MIN(ts) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT DISTINCT f.user_id
  FROM first_click f
  JOIN events e ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) >  epoch_us(f.t_click)
    AND epoch_us(e.ts) <= epoch_us(f.t_click) + 3600000000
)
SELECT CASE WHEN c.user_id IS NOT NULL THEN 'converted' ELSE 'clicked_only' END AS stage,
       COUNT(*) AS n_users
FROM first_click f LEFT JOIN conv c ON f.user_id = c.user_id
GROUP BY 1
""",
)
def events_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: of users who clicked, how many purchased within an hour of
    their FIRST click. Two-stage event-sequence analytics — per-user
    anchor aggregate, then a time-bounded self-join against the stream.
    (Boundaries compare in microseconds on both engines — load_table
    floors the fixture's nanos to micros; the oracle uses epoch_us.)

    Scale: the anchor aggregate collapses events to one row per user
    BEFORE the self-join, and both sides then shuffle on user_id only —
    the time predicate evaluates within the join, never as a nested-loop
    range join. The funnel stages come from one left join + CASE, not a
    second scan."""
    e = load_table(spark, sf_dir, "events")
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        first_click.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("t_click"))
            & (F.col("p_ts") <= F.col("t_click") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(True))
    )
    return (
        first_click.join(conv, "user_id", "left")
        .groupBy(
            F.when(F.col("converted"), "converted")
            .otherwise("clicked_only")
            .alias("stage")
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "events_weekly_cohort_retention",
    oracle="""
WITH cohorts AS (
  SELECT user_id,
         CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP) AS active_week
  FROM events e
)
SELECT epoch_us(c.cohort_week) AS cohort_week_us,
       CAST(FLOOR(DATE_DIFF('day', c.cohort_week, a.active_week) / 7) AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM cohorts c JOIN activity a ON c.user_id = a.user_id
GROUP BY 1, 2
""",
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted as
    active in each subsequent week offset — the standard retention
    triangle, built from one anchor aggregate + one distinct-activity
    projection + one join on user_id.

    Scale: cohorts is one row per user, activity one row per (user,
    week) — both collapse the raw stream before the join, and all three
    shuffles key on user_id so a co-partitioned layout reuses one
    exchange. Never joins raw events to raw events."""
    e = load_table(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("timestamp_ntz").alias("cohort_week")
    )
    activity = e.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("timestamp_ntz").alias("active_week"),
    ).distinct()
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            F.unix_micros(F.col("cohort_week").cast("timestamp_ltz")).alias(
                "cohort_week_us"
            ),
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "events_zscore_anomaly",
    oracle="""
WITH m AS (
  SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS v FROM events
),
s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(v) AS sv,
         SUM(v * v) AS svv
  FROM m GROUP BY event_type
),
st AS (
  SELECT event_type, n, sv / n AS mean,
         SQRT((svv - sv * sv / n) / (n - 1)) AS std
  FROM s
)
SELECT m.event_type,
       MAX(st.n) AS n_events,
       COUNT(CASE WHEN st.n > 1 AND ABS(m.v - st.mean) > 3 * st.std THEN 1 END) AS n_outliers,
       CAST(MAX(st.sv) AS BIGINT) AS sum_millis,
       CAST(MAX(st.n) * MAX(st.svv) - MAX(st.sv) * MAX(st.sv) AS DOUBLE) AS var_num,
       CAST(MAX(st.n) AS BIGINT) * (CAST(MAX(st.n) AS BIGINT) - 1) AS var_den
FROM m JOIN (
  SELECT event_type, n, sv, svv,
         CAST(sv AS DOUBLE) / n AS mean,
         SQRT((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / (n - 1)) AS std
  FROM s
) st USING (event_type)
GROUP BY m.event_type
""",
)
def events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 3-sigma anomaly detection: two-pass z-score over the
    value stream (the observability-pipeline outlier counter). Values are
    scaled to exact integer milli-units so the sums and sums-of-squares
    are exact; mean/std then derive through single IEEE ops on identical
    operands in both engines, making the |v-mean| > 3σ comparison itself
    engine-portable — no epsilon needed.

    The HASHED columns are integer-exact (counts, Σv, and the variance
    fraction n·Σv²−(Σv)² over n·(n−1) — the agg_variance_manual rule: no
    ROUND(double) feeds the hash). The numerator exceeds int64 ((Σv)² ≈
    2.3e19 at sf0.1), so it is computed in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) and cast once to DOUBLE — the same exact integer
    rounds to the same double in both engines. mean/std exist only inside
    the outlier predicate. Singleton groups (n=1) are guarded to zero
    outliers explicitly: unguarded, Spark's (n-1)=0 division NULLs while
    DuckDB's IEEE path NaNs — both count 0 outliers, but the guard makes
    the contract visible rather than coincidental.

    Scale: pass 1 is a map-side-combined moment aggregate (one row per
    type); the tiny stats relation broadcasts back onto the scan for
    pass 2, so the event stream never shuffles — the same
    aggregate-then-broadcast shape as sample_rebalance_uniform."""
    e = load_table(spark, sf_dir, "events")
    m = e.select(
        "event_type", F.round(F.col("value") * 1000).cast("bigint").alias("v")
    )
    n = F.count("*")
    sv = F.sum("v")
    svv = F.sum(F.col("v") * F.col("v"))
    st = m.groupBy("event_type").agg(
        n.alias("n"),
        sv.alias("sv"),
        svv.alias("svv"),
        (sv.cast("double") / n).alias("mean"),
        F.sqrt(
            (svv.cast("double") - sv.cast("double") * sv.cast("double") / n)
            / (n - F.lit(1))
        ).alias("std"),
    )
    return (
        m.join(F.broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.count(
                F.when(
                    (F.col("n") > 1)
                    & (F.abs(F.col("v") - F.col("mean")) > 3 * F.col("std")),
                    1,
                )
            ).alias("n_outliers"),
            F.max("sv").alias("sum_millis"),
            (
                F.max("n").cast("decimal(38,0)") * F.max("svv").cast("decimal(38,0)")
                - F.max("sv").cast("decimal(38,0)") * F.max("sv").cast("decimal(38,0)")
            )
            .cast("double")
            .alias("var_num"),
            (F.max("n") * (F.max("n") - F.lit(1))).alias("var_den"),
        )
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (SELECT event_type, next_type FROM seq WHERE next_type IS NOT NULL),
tot AS (SELECT event_type, COUNT(*) AS n_from FROM pairs GROUP BY event_type)
SELECT p.event_type AS from_type, p.next_type AS to_type,
       COUNT(*) AS n_transitions,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.n_from), 6) AS p_transition
FROM pairs p JOIN tot t USING (event_type)
GROUP BY p.event_type, p.next_type
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov transition matrix: per-user event sequences
    (total order: ts then event_id) yield (from, to) adjacent pairs;
    counts normalize into first-order transition probabilities — the
    funnel-discovery/path-analysis primitive. The probability is one IEEE
    division of two exact counts, rounded once (deterministic cross-
    engine per the registry contract).

    Scale: the lead() window hash-partitions on user_id (no global
    window); pair and total aggregates combine map-side; the per-from
    totals relation is |event types| rows and broadcasts back."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n_transitions"))
    tot = pairs.groupBy("from_type").agg(F.sum("n_transitions").alias("n_from"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions").cast("double") / F.col("n_from"), 6).alias(
            "p_transition"
        ),
    )


@register(
    "events_hourly_locf",
    oracle="""
WITH m AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h, value FROM events),
hourly AS (
  SELECT event_type, h, COUNT(*) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
  FROM m GROUP BY event_type, h
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM m),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM m) t,
       bounds,
       LATERAL (SELECT UNNEST(generate_series(bounds.lo, bounds.hi)) AS h) g
)
SELECT s.event_type, s.h AS hour_h,
       COALESCE(hourly.n_events, 0) AS n_events,
       CASE WHEN hourly.h IS NULL THEN 1 ELSE 0 END AS was_filled,
       last_value(hourly.sum_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_locf
FROM spine s LEFT JOIN hourly ON hourly.event_type = s.event_type AND hourly.h = s.h
""",
)
def events_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward:
    build the dense (event_type x hour) spine, left-join the observed
    hourly rollup, and forward-fill missing hours with the last known
    value (last() IGNORE NULLS over an explicit running frame) — the
    time-series densification every monitoring/feature pipeline needs
    before windowed models. Hours are epoch-hour BIGINTs (timestamps
    would flap the canonicalizer); the filled value is a COPY of an
    already-rounded hourly aggregate, so forward-filling adds no new
    float arithmetic.

    Scale: the spine is |types| x |hours| (metadata-sized relative to
    events); the rollup combines map-side; the fill window partitions by
    type — no global window."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        # session tz is UTC, so ntz->ltz is identity and unix_micros here
        # equals DuckDB's epoch_us on the same timestamps
        F.expr("unix_micros(cast(ts as timestamp_ltz)) div 3600000000").alias("h"),
        "value",
    )
    hourly = m.groupBy("event_type", "h").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "sum_value"
        ),
    )
    bounds = m.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = m.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.col("h").alias("hour_h"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("was_filled"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_locf"),
    )


@register(
    "rolling_active_users_7d",
    oracle="""
WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
spine AS (SELECT DISTINCT d FROM du),
fan AS (
  SELECT du.d + g.i AS anchor_d, du.user_id
  FROM du, LATERAL (SELECT UNNEST(generate_series(0, 6)) AS i) g
),
w AS (
  SELECT anchor_d, COUNT(DISTINCT user_id) AS n_active_7d
  FROM fan WHERE anchor_d IN (SELECT d FROM spine)
  GROUP BY anchor_d
),
dd AS (SELECT d, COUNT(DISTINCT user_id) AS n_active_1d FROM du GROUP BY d)
SELECT dd.d AS day_d, n_active_1d, n_active_7d,
       (n_active_1d * 1000) // n_active_7d AS stickiness_milli
FROM dd JOIN w ON w.anchor_d = dd.d
""",
)
def rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day (the engagement "stickiness"
    metric): exact rolling-window DISTINCT counts. A windowed
    COUNT(DISTINCT) does not exist (distinct is not frame-combinable);
    the scalable exact form FANS each (day, user) membership out to the
    ≤7 anchor days it contributes to, then runs plain distinct
    aggregates — equi-joins and hash aggs only, no range join, no
    per-day re-scan of raw events. Stickiness is an exact integer
    milli-ratio (the agg_variance_manual hash rule).

    Scale: the fan-out is 7× the DEDUPED (day, user) relation — already
    collapsed from raw events by the first distinct, so the multiplier
    applies to the small side; anchors outside the observed spine are
    semi-join-pruned. Window length w costs w×, independent of corpus
    size. Day keys are epoch-day BIGINTs (unix_micros div 86400000000 /
    epoch_us //) — identical integers in both engines."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000")
    du = e.select(day.alias("d"), "user_id").distinct()
    spine = du.select("d").distinct()
    fan = du.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("anchor_d"),
        "user_id",
    )
    w = (
        fan.join(
            spine.withColumnRenamed("d", "anchor_d"), "anchor_d", "left_semi"
        )
        .groupBy("anchor_d")
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
    )
    dd = du.groupBy("d").agg(F.countDistinct("user_id").alias("n_active_1d"))
    return (
        dd.join(w, dd.d == w.anchor_d)
        .select(
            F.col("d").alias("day_d"),
            "n_active_1d",
            "n_active_7d",
            F.expr("(n_active_1d * 1000) div n_active_7d").alias(
                "stickiness_milli"
            ),
        )
    )


@register(
    "events_ewma_per_user",
    oracle="""
WITH arr AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
),
capped AS (
  SELECT user_id, n_events,
         CASE WHEN len(vs) > 64 THEN vs[len(vs) - 63 :] ELSE vs END AS cv
  FROM arr
)
SELECT user_id, n_events,
       ROUND(list_reduce(cv, (acc, x) -> acc * 0.75 + x * 0.25), 6) AS ewma_value
FROM capped
""",
)
def events_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values
    (alpha = 0.25) — the smoothing companion to events_zscore_anomaly's
    global 3-sigma gate: the per-entity baseline a drifting sensor or
    spend stream is compared against.

    Determinism: EWMA is an ordered SEQUENTIAL FOLD, so both engines run
    the identical chain of IEEE ops (Spark ``aggregate`` seeded with the
    first element to match DuckDB ``list_reduce``'s first-element seed —
    the verify-recipe fold-seed rule) and the result is bit-identical;
    rounded once per group at output. No summed-then-rounded term ever
    feeds the hash.

    Scale: state per user is the trailing 64 values (contributions
    beyond that are < (3/4)^64 ~ 1e-8 — below the rounded output), so
    per-group memory is capped regardless of history length; the
    collect+fold shares the single user_id shuffle. For unbounded
    per-entity streams the same fold runs incrementally in
    streaming/jobs.py's stateful shapes."""
    e = load_table(spark, sf_dir, "events")
    arr = e.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, "
            "CAST(value AS DOUBLE) AS v))), s -> s.v)"
        ).alias("vs"),
        F.count("*").alias("n_events"),
    )
    capped = arr.select(
        "user_id",
        "n_events",
        F.expr(
            "CASE WHEN size(vs) > 64 THEN slice(vs, size(vs) - 63, 64) ELSE vs END"
        ).alias("cv"),
    )
    return capped.select(
        "user_id",
        "n_events",
        F.expr(
            "round(aggregate(slice(cv, 2, size(cv) - 1),"
            " element_at(cv, 1),"
            " (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)), 6)"
        ).alias("ewma_value"),
    )


@register(
    "events_cusum_drift",
    oracle="""
WITH v AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_e6
  FROM events
),
tm AS (
  SELECT event_type, CAST(SUM(v_e6) AS BIGINT) // COUNT(*) AS mean_e6
  FROM v GROUP BY event_type
),
d AS (
  SELECT user_id, v.event_type, ts, event_id, v_e6 - mean_e6 AS dd
  FROM v JOIN tm ON v.event_type = tm.event_type
),
p AS (
  SELECT user_id, event_type, ts, event_id, dd,
         CAST(SUM(dd) OVER w AS BIGINT) AS pre
  FROM d
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT user_id, event_type, dd, pre,
         pre - LEAST(CAST(0 AS BIGINT), MIN(pre) OVER w) AS cus
  FROM p
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_type,
       COUNT(*) AS n_events,
       CAST(MAX(cus) AS BIGINT) AS peak_cusum_e6,
       CAST(SUM(dd) AS BIGINT) - LEAST(CAST(0 AS BIGINT), MIN(pre)) AS final_cusum_e6
FROM c
GROUP BY user_id, event_type
""",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point statistic per (user, event_type):
    how far each entity's values have drifted ABOVE the population mean
    of its event type — the classic upward-shift detector
    (c_i = max(0, c_{i-1} + (x_i - target))), complementing the EWMA
    baseline and the 3-sigma point gate.

    Computed in CLOSED FORM instead of a recursive fold:
    ``c_i = P_i - min(0, min_{j<=i} P_j)`` over the running delta sum
    P — plain window functions, so the whole statistic is exact BIGINT
    arithmetic on e6-scaled values with a bit-identical DuckDB twin (no
    per-row recursion, no float accumulation). Target = per-type mean as
    a floor-divided integer.

    Scale: one map-side-combined per-type mean (broadcast back), then
    both windows and the final rollup share a single
    (user_id, event_type) shuffle; state per row is two BIGINTs."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1000000).cast("bigint").alias("v_e6"),
    )
    tm = v.groupBy("event_type").agg(
        F.expr("CAST(SUM(v_e6) AS BIGINT) div COUNT(*)").alias("mean_e6")
    )
    d = v.join(F.broadcast(tm), "event_type").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.col("v_e6") - F.col("mean_e6")).alias("dd"),
    )
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.withColumn("pre", F.sum("dd").over(w).cast("bigint"))
    c = p.withColumn(
        "cus",
        F.col("pre")
        - F.least(F.lit(0).cast("bigint"), F.min("pre").over(w)),
    )
    return c.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"),
        F.max("cus").cast("bigint").alias("peak_cusum_e6"),
        (
            F.sum("dd").cast("bigint")
            - F.least(F.lit(0).cast("bigint"), F.min("pre"))
        ).alias("final_cusum_e6"),
    )


@register(
    "events_trend_slope",
    oracle="""
WITH base AS (
  SELECT event_type, epoch_us(ts) AS t_us,
         CAST(ROUND(value * 1000000) AS BIGINT) AS y_e6
  FROM events
),
rebased AS (
  SELECT event_type,
         (t_us - MIN(t_us) OVER (PARTITION BY event_type)) // 60000000 AS x_min,
         y_e6
  FROM base
),
moments AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(x_min) AS BIGINT) AS sx,
         CAST(SUM(y_e6) AS BIGINT) AS sy,
         CAST(SUM(x_min * y_e6) AS BIGINT) AS sxy,
         CAST(SUM(x_min * x_min) AS BIGINT) AS sxx
  FROM rebased
  GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx = 0 THEN 0.0
            ELSE ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                       / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
       END AS slope_e6_per_min
FROM moments
""",
)
def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend slope of event values over time, per event
    type: the five moments (n, Σx, Σy, Σxy, Σx²) accumulate as EXACT
    BIGINTs (the agg_variance_manual discipline — no double accumulation,
    so partitioning cannot perturb them), and only the final three IEEE
    ops (two products, one division per group) run in double — each
    correctly rounded on identical exact inputs, hence bit-identical
    across engines, rounded once at output. The n·Σxy-style final
    products are what overflow int64 on large groups — doubles carry
    them at any scale.

    x is minutes since each type's first event (rebasing keeps the
    moment sums themselves within int64 far past sf 10).

    Scale: the rebase MIN window and the moment aggregate share one
    event_type shuffle; all five moments are map-side-combined sums."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    ts_ltz = F.col("ts").cast("timestamp_ltz")
    base = e.select(
        "event_type",
        F.unix_micros(ts_ltz).alias("t_us"),
        F.round(F.col("value") * 1000000).cast("bigint").alias("y_e6"),
    )
    w = Window.partitionBy("event_type")
    rebased = base.select(
        "event_type",
        F.expr(
            "CAST((t_us - MIN(t_us) OVER (PARTITION BY event_type)) div 60000000 AS BIGINT)"
        ).alias("x_min"),
        "y_e6",
    )
    moments = rebased.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x_min").cast("long").alias("sx"),
        F.sum("y_e6").cast("long").alias("sy"),
        F.sum(F.col("x_min") * F.col("y_e6")).cast("long").alias("sxy"),
        F.sum(F.col("x_min") * F.col("x_min")).cast("long").alias("sxx"),
    )
    den = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    return moments.select(
        "event_type",
        "n",
        F.when(den == 0, F.lit(0.0))
        .otherwise(F.round(num / den, 6))
        .alias("slope_e6_per_min"),
    )


@register(
    "events_conversion_latency_hist",
    oracle="""
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT c.event_id,
         MIN(epoch_us(p.ts) - epoch_us(c.ts)) AS lat_us
  FROM c JOIN p
    ON c.user_id = p.user_id
   AND p.ts >= c.ts
   AND p.ts <= c.ts + INTERVAL 2 DAY
  GROUP BY c.event_id
)
SELECT LEAST(CAST(11 AS BIGINT), lat_us // 14400000000) AS lat_bucket_4h,
       COUNT(*) AS n_conversions,
       CAST(MIN(lat_us) AS BIGINT) AS min_lat_us,
       CAST(MAX(lat_us) AS BIGINT) AS max_lat_us
FROM conv
GROUP BY LEAST(CAST(11 AS BIGINT), lat_us // 14400000000)
""",
)
def events_conversion_latency_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every click that converts
    within 2 days, the latency to the FIRST subsequent purchase by the
    same user, bucketed into 4-hour bins (12th bucket collects the
    tail) — the funnel family's "how fast", where
    events_funnel_click_purchase answers "how many".

    The inequality join runs through operators/temporal.range_join_days
    (day-bucket blocking → an equi-join on (user_id, day); Catalyst
    alone would pick BroadcastNestedLoopJoin for the raw BETWEEN), the
    first-conversion MIN and the histogram are map-side-combined
    aggregates, and every output is an exact epoch-micros BIGINT."""
    from db_writer_redshift_spark.operators.temporal import range_join_days

    e = load_table(spark, sf_dir, "events")
    ts_ltz = F.col("ts").cast("timestamp_ltz")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.col("ts").alias("c_ts"),
        F.expr(
            "CAST(ts AS TIMESTAMP_LTZ) + INTERVAL 2 DAY"
        ).cast("timestamp_ntz").alias("c_end"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    pairs = range_join_days(
        purchases.select("user_id", "p_ts"),
        clicks.select("event_id", "user_id", F.col("c_ts").alias("r_start"), F.col("c_end").alias("r_end")),
        left_ts="p_ts",
        range_start="r_start",
        range_end="r_end",
        keys=["user_id"],
    )
    conv = pairs.groupBy("event_id").agg(
        F.min(
            F.unix_micros(F.col("p_ts").cast("timestamp_ltz"))
            - F.unix_micros(F.col("r_start").cast("timestamp_ltz"))
        ).alias("lat_us")
    )
    bucket = F.least(
        F.lit(11).cast("bigint"), F.expr("lat_us div 14400000000")
    ).alias("lat_bucket_4h")
    return conv.groupBy(bucket).agg(
        F.count("*").alias("n_conversions"),
        F.min("lat_us").cast("bigint").alias("min_lat_us"),
        F.max("lat_us").cast("bigint").alias("max_lat_us"),
    )


@register(
    "events_concurrency_peak",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
         ts
  FROM flagged
),
iv AS (
  SELECT user_id, session_id,
         epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
  FROM sessions GROUP BY user_id, session_id
),
sweep AS (
  SELECT d AS epoch_day, user_id, session_id,
         GREATEST(s_us, d * 86400000000) AS pt, 1 AS delta
  FROM iv, UNNEST(generate_series(s_us // 86400000000, e_us // 86400000000)) AS t(d)
  UNION ALL
  SELECT d AS epoch_day, user_id, session_id,
         LEAST(e_us, (d + 1) * 86400000000 - 1) AS pt, -1 AS delta
  FROM iv, UNNEST(generate_series(s_us // 86400000000, e_us // 86400000000)) AS t(d)
),
run AS (
  SELECT epoch_day, delta,
         CAST(SUM(delta) OVER (PARTITION BY epoch_day
              ORDER BY pt, delta DESC, user_id, session_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
  FROM sweep
)
SELECT epoch_day,
       MAX(conc) AS peak_concurrency,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_active_sessions
FROM run
GROUP BY epoch_day
""",
)
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by interval sweep-line: gap
    sessionization (the events_sessionization machinery) yields
    [start, end] intervals; each interval splits into the days it
    touches (clipped — sessions are ≤ 30-min-gap chains, so ≤ 2 days);
    per day, +1/−1 deltas ordered by (instant, starts-before-ends at
    ties) prefix-sum to the live-session count, whose max is the peak —
    the classic O(n log n) interval-overlap algorithm, shuffled once
    per day partition instead of a global sort. Capacity planning /
    rate-limit sizing over 100 TB of event history runs exactly this.

    Determinism: the per-day MAX of the running sum is invariant to
    ordering within an (instant, delta) tie group (+1s raise the run
    monotonically; −1s lower it), so the output hashes identically even
    though tie order between equal keys is arbitrary. All integers
    (epoch-µs, epoch-day floor divisions)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ltz = F.col("ts").cast("timestamp_ltz")
    gap_us = F.unix_micros(ts_ltz) - F.unix_micros(F.lag(ts_ltz).over(w))
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    iv = (
        flagged.select(
            "user_id",
            "ts",
            F.sum("new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts").cast("timestamp_ltz")).alias("s_us"),
            F.unix_micros(F.max("ts").cast("timestamp_ltz")).alias("e_us"),
        )
    )
    day_us = 86_400_000_000
    days = iv.select(
        "user_id",
        "session_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {day_us}"), F.expr(f"e_us div {day_us}")
            )
        ).alias("epoch_day"),
    )
    starts = days.select(
        "epoch_day",
        "user_id",
        "session_id",
        F.greatest(F.col("s_us"), F.col("epoch_day") * day_us).alias("pt"),
        F.lit(1).alias("delta"),
    )
    ends = days.select(
        "epoch_day",
        "user_id",
        "session_id",
        F.least(F.col("e_us"), (F.col("epoch_day") + 1) * day_us - 1).alias("pt"),
        F.lit(-1).alias("delta"),
    )
    sweep = starts.unionByName(ends)
    wd = Window.partitionBy("epoch_day").orderBy(
        F.col("pt"), F.col("delta").desc(), F.col("user_id"), F.col("session_id")
    )
    run = sweep.select(
        "epoch_day",
        "delta",
        F.sum("delta")
        .over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("conc"),
    )
    return run.groupBy("epoch_day").agg(
        F.max("conc").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_active_sessions"),
    )


@register(
    "events_top_session_paths",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessions GROUP BY user_id, session_id
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 25
""",
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 exact session paths: sessionize with the same 30-min gap
    rule as events_sessionization, concatenate each session's ordered
    event types into a path string, and rank paths by frequency — the
    order-SENSITIVE sequence rollup the transition matrix (bigrams)
    cannot express. Tie-breaks are total: (ts, event_id) orders events
    within a session; (n_sessions DESC, path) orders the leaderboard.

    Scale: both windows and the path aggregate share one user_id
    shuffle; paths are session-bounded strings; the leaderboard is
    orderBy+limit, which Spark executes as TakeOrderedAndProject — 25
    rows per partition reach the driver-side merge, never the full
    path distribution."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ltz = F.col("ts").cast("timestamp_ltz")
    gap_us = F.unix_micros(ts_ltz) - F.unix_micros(F.lag(ts_ltz).over(w))
    sessions = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(
            F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    paths = sessions.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(25)
    )


@register(
    "events_multitouch_attribution",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS jid
  FROM events
),
touches AS (
  SELECT user_id, jid, event_type, ts, event_id
  FROM tagged
  WHERE event_type <> 'purchase' AND jid >= 1
),
pos AS (
  SELECT user_id, jid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, jid
                            ORDER BY ts, event_id) AS p,
         COUNT(*) OVER (PARTITION BY user_id, jid) AS n
  FROM touches
),
credit AS (
  SELECT event_type, p, n,
         CASE WHEN n = 1 THEN 1000
              WHEN n = 2 THEN 500
              WHEN p = 1 THEN 400 + (200 - (n - 2) * (200 // (n - 2)))
              WHEN p = n THEN 400
              ELSE 200 // (n - 2) END AS credit_permille
  FROM pos
)
SELECT event_type AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit_permille) AS BIGINT) AS total_credit_permille,
       CAST(SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first_touch,
       CAST(SUM(CASE WHEN p = n THEN 1 ELSE 0 END) AS BIGINT) AS n_last_touch
FROM credit
GROUP BY event_type
""",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch conversion attribution —
    the standard marketing-analytics credit rule (40% first touch, 40%
    last touch, 20% split across middles; the rule-based stand-in for
    Shapley-value attribution, to which it is the two-endpoint
    approximation): every non-purchase event is assigned to its user's
    NEXT purchase (journeys never straddle purchases), positions rank
    within the journey, and each conversion distributes exactly 1000
    permille of credit. Touches after a user's last purchase attribute
    to nothing and drop; purchases with no preceding touches are
    'direct' conversions carrying no touch credit.

    Journey assignment without a join: a DESCENDING running count of
    purchases per user (jid) gives every event the number of purchases
    at-or-after it — touches share their jid with exactly the next
    purchase. One window over the user partition replaces the
    touch-to-purchase as-of join.

    Integer exactness: credit is permille with floor division for the
    middle split; the remainder (200 - (n-2)*floor(200/(n-2))) rides on
    the first touch, so every journey sums to exactly 1000 — the
    identity the pytest asserts — and n=1 (1000) / n=2 (500/500)
    degenerate cases follow the published rule. No floats anywhere.

    Scale: two windows and one aggregate, all hash-partitioned on
    user_id (journeys are user-local by construction) — no global sort,
    no self-join; the rollup combines map-side to |event types| rows."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w_rev).alias("jid"),
    )
    touches = tagged.filter(
        (F.col("event_type") != "purchase") & (F.col("jid") >= 1)
    )
    wj = Window.partitionBy("user_id", "jid")
    pos = touches.select(
        "event_type",
        F.row_number().over(wj.orderBy("ts", "event_id")).alias("p"),
        F.count("*").over(wj).alias("n"),
    )
    credit = pos.select(
        "event_type",
        "p",
        "n",
        F.expr(
            "CASE WHEN n = 1 THEN 1000L"
            " WHEN n = 2 THEN 500L"
            " WHEN p = 1 THEN 400 + (200 - (n - 2) * (200 div (n - 2)))"
            " WHEN p = n THEN 400L"
            " ELSE 200 div (n - 2) END"
        ).alias("credit_permille"),
    )
    return credit.groupBy(F.col("event_type").alias("touch_type")).agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum("credit_permille").cast("long").alias("total_credit_permille"),
        F.sum(F.when(F.col("p") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_first_touch"),
        F.sum(F.when(F.col("p") == F.col("n"), 1).otherwise(0))
        .cast("long")
        .alias("n_last_touch"),
    )


@register(
    "asof_forward_click_to_purchase",
    oracle="""
WITH clk AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
  FROM events WHERE event_type = 'click'
),
pur AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pur_us
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT c.click_id, c.user_id, c.click_us, p.purchase_id, p.pur_us
  FROM clk c ASOF LEFT JOIN pur p
    ON c.user_id = p.user_id AND c.click_us <= p.pur_us
)
SELECT click_id, user_id, click_us,
       CASE WHEN pur_us - click_us <= 3600000000
            THEN purchase_id END AS next_purchase_id,
       CASE WHEN pur_us - click_us <= 3600000000
            THEN pur_us - click_us END AS latency_us,
       CASE WHEN pur_us - click_us <= 3600000000
            THEN 1 ELSE 0 END AS matched
FROM j
""",
)
def asof_forward_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (pandas ``merge_asof``
    direction='forward' semantics; DuckDB expresses it as ``ASOF LEFT
    JOIN ... ON l.ts <= r.ts``): each click attaches its user's NEXT
    purchase, nulled when it is more than one hour away — the
    click-to-conversion attachment with a business-rule attribution
    window, complementing the backward asof_join_purchase_attribution.

    Same union-trick plan as the backward direction (one shuffle on
    user_id, one window pass, no inequality join); the tolerance is a
    post-fill CASE, so the 1-hour cut changes no plan shape. Timestamps
    and latency ship as epoch-micros BIGINTs (graded-window envelope);
    (user_id, ts) is unique within purchases at every SF, so the carried
    match is total-order deterministic.

    Scale: identical to the proven as-of shape — linear in events, one
    hash partition by user; tolerance adds a row-local filter only."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pur_us"),
        "ts",
        "user_id",
    )
    j = asof_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        right_cols=["purchase_id", "pur_us"],
        direction="forward",
        tolerance=3_600_000_000,
    )
    return j.select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_us"),
        F.col("purchase_id").alias("next_purchase_id"),
        (F.col("pur_us") - F.col("ts")).alias("latency_us"),
        F.when(F.col("purchase_id").isNotNull(), 1).otherwise(0).alias("matched"),
    )


@register(
    "events_json_props_rollup",
    oracle="""
WITH x AS (
  SELECT event_type,
         CAST(json_extract(props::JSON, '$.k') AS BIGINT) AS k,
         CAST(ROUND(CAST(value AS DECIMAL(18,6)) * 100) AS BIGINT) AS value_c
  FROM events
)
SELECT event_type,
       k // 10 AS k_decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(SUM(value_c) AS BIGINT) AS value_cents
FROM x
GROUP BY event_type, k // 10
""",
)
def events_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction + rollup: pull the typed
    ``k`` field out of the JSON ``props`` payload (Spark
    ``get_json_object`` — a codegen'd row-local path evaluation, the
    JSON-column pattern every event-analytics engine ships) and roll up
    per (event_type, k-decile) with exact integer stats. The ``value``
    monetary column rides along as exact cents (DECIMAL round — the
    registry's exact-SUM contract, never a float sum).

    Scale: JSON extraction is scan-stage and row-local (no shuffle,
    no UDF — the built-in path evaluator); the rollup is one map-side-
    combined aggregate over |event_type| x 10 groups. At 100 TB the
    only cost is the scan-stage parse, which columnar JSON shredding
    (or promoting hot paths to real columns at ingest, the documented
    lakehouse move) removes entirely."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        F.expr(
            "CAST(ROUND(CAST(value AS DECIMAL(18,6)) * 100) AS BIGINT)"
        ).alias("value_c"),
    )
    return x.groupBy(
        "event_type", F.expr("k div 10").alias("k_decile")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
        F.sum("k").cast("long").alias("k_sum"),
        F.sum("value_c").cast("long").alias("value_cents"),
    )


@register(
    "events_funnel_three_step",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
),
s1 AS (
  SELECT user_id, MIN(t) AS t1 FROM ev WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT s1.user_id, s1.t1, MIN(e.t) AS t2
  FROM s1 JOIN ev e ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.t > s1.t1 AND e.t <= s1.t1 + 86400000000
  GROUP BY s1.user_id, s1.t1
),
s3 AS (
  SELECT s2.user_id, s2.t1, s2.t2, MIN(e.t) AS t3
  FROM s2 JOIN ev e ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.t > s2.t2 AND e.t <= s2.t2 + 86400000000
  GROUP BY s2.user_id, s2.t1, s2.t2
),
staged AS (
  SELECT s1.user_id,
         CASE WHEN s3.user_id IS NOT NULL THEN 3
              WHEN s2.user_id IS NOT NULL THEN 2
              ELSE 1 END AS stage_n,
         s2.t2 - s1.t1 AS lat12,
         s3.t3 - s2.t2 AS lat23
  FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
          LEFT JOIN s3 ON s1.user_id = s3.user_id
)
SELECT CASE stage_n WHEN 1 THEN 'viewed_only' WHEN 2 THEN 'clicked'
            ELSE 'purchased' END AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(lat12), 0) AS BIGINT) AS sum_view_to_click_us,
       CAST(COALESCE(SUM(lat23), 0) AS BIGINT) AS sum_click_to_purchase_us
FROM staged
GROUP BY stage_n
""",
)
def events_funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential three-step funnel with per-step timeouts (the
    Mixpanel/Amplitude funnel semantics): first view, then the FIRST
    click within 24 hours of it, then the FIRST purchase within 24
    hours of that click (the fixture's per-user event cadence is hours
    apart, so day-scale windows keep every stage populated at every
    SF — the vacuity rule). Users bucket by the deepest stage reached;
    step latencies sum exactly in integer microseconds. Strict
    sequencing (each anchor is the MIN qualifying timestamp after the
    previous anchor) — an out-of-order purchase does not convert.

    Scale: each step collapses to ONE row per user via a MIN aggregate
    BEFORE the next user-keyed equi-join (the time predicate rides the
    join, never a nested-loop range join), so the funnel is two
    broadcast-sized joins on the click/purchase streams plus map-side-
    combined aggregates — per-user state never exceeds three BIGINTs.
    Deterministic: MIN anchors, integer micros, no floats."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t"),
    )
    day = 86_400_000_000
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("t").alias("ct")
    )
    s2 = (
        s1.join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("ct") > F.col("t1"))
            & (F.col("ct") <= F.col("t1") + day),
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ct").alias("t2"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("t").alias("pt")
    )
    s3 = (
        s2.join(
            purchases,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pt") > F.col("t2"))
            & (F.col("pt") <= F.col("t2") + day),
        )
        .groupBy("user_id", "t2")
        .agg(F.min("pt").alias("t3"))
    )
    staged = (
        s1.join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3.select("user_id", "t3"), "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
            .alias("stage_n"),
            (F.col("t2") - F.col("t1")).alias("lat12"),
            (F.col("t3") - F.col("t2")).alias("lat23"),
        )
    )
    return staged.groupBy(
        F.expr(
            "CASE stage_n WHEN 1 THEN 'viewed_only' WHEN 2 THEN 'clicked'"
            " ELSE 'purchased' END"
        ).alias("stage")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        F.coalesce(F.sum("lat12"), F.lit(0)).cast("long").alias("sum_view_to_click_us"),
        F.coalesce(F.sum("lat23"), F.lit(0)).cast("long").alias("sum_click_to_purchase_us"),
    )


@register(
    "events_hazard_table",
    oracle="""
WITH span AS (
  SELECT user_id,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 86400000000 AS life_days
  FROM events GROUP BY user_id
),
d AS (SELECT life_days, CAST(COUNT(*) AS BIGINT) AS churned
      FROM span GROUP BY life_days),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM span),
tbl AS (
  SELECT life_days AS t_days, churned,
         tot.n_users
           - COALESCE(SUM(churned) OVER (ORDER BY life_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM d CROSS JOIN tot
)
SELECT t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk, churned,
       CAST((1000000 * churned) // n_at_risk AS BIGINT) AS hazard_ppm
FROM tbl
""",
)
def events_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival HAZARD TABLE — the Kaplan-Meier estimator's
    ingredient relation (Kaplan & Meier 1958): lifetime = whole days
    between a user's first and last event; for each observed lifetime t,
    the users still at risk (lifetime >= t), the users churning exactly
    at t, and the discrete hazard d/n in exact ppm. The survival curve
    itself is the running product Π(1 - hazard), a float chain left to
    the consumer — the TABLE is what cross-engine exactness can
    guarantee (per-term products re-order under distribution, the known
    flap class), and every published KM plot is drawn from exactly this
    relation.

    Scale: one user-keyed MIN/MAX aggregate (map-side combined), one
    lifetime histogram, and a cumulative window over the DISTINCT-
    lifetime relation (bounded by the observation window in days, not
    by users). All integers: floor-div day buckets, ppm floor hazard."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t")
    )
    span = e.groupBy("user_id").agg(
        F.expr("(MAX(t) - MIN(t)) div 86400000000").alias("life_days")
    )
    d = span.groupBy("life_days").agg(F.count("*").cast("long").alias("churned"))
    tot = span.agg(F.count("*").cast("long").alias("n_users"))
    from pyspark.sql.window import Window

    w = Window.orderBy("life_days").rowsBetween(Window.unboundedPreceding, -1)
    tbl = d.crossJoin(F.broadcast(tot)).select(
        F.col("life_days").alias("t_days"),
        "churned",
        (
            F.col("n_users")
            - F.coalesce(F.sum("churned").over(w), F.lit(0))
        ).cast("long").alias("n_at_risk"),
    )
    return tbl.select(
        "t_days",
        "n_at_risk",
        "churned",
        F.expr("(1000000 * churned) div n_at_risk").alias("hazard_ppm"),
    )
