"""Batch-mode oracle checks for the streaming transformations.

Structured Streaming's guarantee is that a streaming query computes the
same answer as the batch query over the same (eventually-arrived) data —
so each transformation in streaming/pipelines.py is registered here against
the batch ``events`` table with a DuckDB oracle. The streaming tests
(tests/test_streaming.py) then assert stream-vs-batch equality, closing the
triangle: oracle == batch == stream.

DuckDB notes: window starts are epoch-aligned via integer arithmetic on
epoch seconds (time_bucket's origin conventions differ per unit; integer
math is unambiguous); session windows are the classic gaps-and-islands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sol_spark.registry import register
from sol_spark.streaming import pipelines as P
from sol_spark.tables import load_tables

TUMBLING_ORACLE = """
SELECT to_timestamp(floor(epoch(ts))::BIGINT // 3600 * 3600)::TIMESTAMP AS window_start,
       to_timestamp(floor(epoch(ts))::BIGINT // 3600 * 3600 + 3600)::TIMESTAMP AS window_end,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


@register("stream_tumbling_agg", TUMBLING_ORACLE, tags=("streaming", "window"))
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (streaming/pipelines.tumbling_counts on
    the batch table; the identical plan runs under readStream)."""
    t = load_tables(spark, sf_dir)
    return P.tumbling_counts(t["events"]).orderBy("window_start", "event_type")


SLIDING_ORACLE = """
WITH starts AS (
  SELECT e.*, to_timestamp(floor(epoch(ts))::BIGINT // 1800 * 1800 - s.k * 1800)::TIMESTAMP AS window_start
  FROM events e, (SELECT unnest([0, 1]) AS k) s
)
SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM starts
GROUP BY 1
ORDER BY window_start
"""


@register("stream_sliding_agg", SLIDING_ORACLE, tags=("streaming", "window"))
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1h window / 30min slide => every event
    belongs to exactly 2 windows; the oracle materializes both)."""
    t = load_tables(spark, sf_dir)
    return P.sliding_avg(t["events"]).orderBy("window_start")


SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       (max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM numbered
GROUP BY user_id, sess
ORDER BY user_id, session_start
"""


@register("stream_session_window", SESSION_ORACLE, tags=("streaming", "window", "session"))
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) — F.session_window, the post-2.4 upgrade
    the reference lacks (SURVEY §2.9); oracle is gaps-and-islands SQL."""
    t = load_tables(spark, sf_dir)
    return P.session_stats(t["events"]).orderBy("user_id", "session_start")


DEDUP_FIRST_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn = 1
ORDER BY user_id, event_type
"""


@register("stream_dedup_first", DEDUP_FIRST_ORACLE, tags=("streaming", "dedup"))
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic batch shape of streaming dropDuplicates (first row per
    key in event-time order — what StreamingDeduplicateExec keeps when
    input arrives in order)."""
    t = load_tables(spark, sf_dir)
    return P.first_event_per_key(t["events"]).orderBy("user_id", "event_type")


JOIN_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, p.value, v.ts AS v_ts
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY p.event_id, v_ts
"""


@register("stream_stream_join", JOIN_ORACLE, tags=("streaming", "join"))
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the watermarked stream-stream join
    (purchases x views within 1 hour, per user)."""
    t = load_tables(spark, sf_dir)
    return P.purchases_with_recent_view(t["events"]).orderBy("event_id", "v_ts")


JOIN_OUTER_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, p.value, v.ts AS v_ts
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY p.event_id, v_ts
"""


@register("stream_stream_join_outer", JOIN_OUTER_ORACLE, tags=("streaming", "join", "outer"))
def stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the LEFT OUTER watermarked stream-stream join —
    unmatched purchases keep a null v_ts. The streaming side (null rows
    emitted on watermark-driven state eviction) is verified in
    tests/test_streaming.py::test_stream_stream_left_outer_join."""
    t = load_tables(spark, sf_dir)
    return P.purchases_with_recent_view_outer(t["events"]).orderBy("event_id", "v_ts")


JOIN_FULL_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, p.value, v.v_user, v.ts AS v_ts
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
FULL JOIN (SELECT user_id AS v_user, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.v_user
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY p.event_id, v_ts
"""


@register("stream_stream_join_full", JOIN_FULL_ORACLE, tags=("streaming", "join", "outer"))
def stream_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the FULL OUTER watermarked stream-stream join —
    unmatched rows from BOTH sides null-extend (views that led to no
    purchase are the dominant population). Streaming emission of both
    sides' outer rows on watermark eviction is verified in
    tests/test_streaming.py::test_stream_stream_full_outer_join."""
    t = load_tables(spark, sf_dir)
    return P.purchases_with_recent_view_full(t["events"]).orderBy("event_id", "v_ts")


ROLLUP_TIME_ORACLE = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       CASE WHEN grouping(event_type) = 1 THEN NULL ELSE event_type END AS event_type,
       grouping(event_type) AS g_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP(date_trunc('day', ts), event_type)
HAVING grouping(date_trunc('day', ts)) = 0
ORDER BY day, g_type, event_type
"""


@register("time_rollup_hierarchy", ROLLUP_TIME_ORACLE, tags=("window", "groupingsets", "agg"))
def time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: per-(day, event_type) aggregates plus
    per-day subtotals in ONE pass via ROLLUP (ExpandExec row replication,
    reference ExpandExec.scala:37) — the continuous-aggregate pattern for
    time-series stores, here as a single grouping-sets aggregate rather
    than a second scan."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .withColumn("day", F.date_trunc("day", "ts").cast("timestamp_ntz"))
        .rollup("day", "event_type")
        .agg(
            F.grouping("event_type").alias("g_type"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .filter(F.grouping("day") == 0)
        .select("day", "event_type", "g_type", "n", "sum_value")
        .orderBy("day", "g_type", "event_type")
    )


UNIQUE_USERS_ORACLE = """
SELECT to_timestamp(floor(epoch(ts))::BIGINT // 3600 * 3600)::TIMESTAMP AS window_start,
       count(DISTINCT user_id) AS exact_users,
       true AS within_4pct
FROM events
GROUP BY 1
ORDER BY window_start
"""


@register("stream_window_unique_users", UNIQUE_USERS_ORACLE, tags=("streaming", "window", "approx"))
def stream_window_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of pipelines.window_unique_users plus the correctness
    gate: the HLL++ estimate must land within 4% of the exact per-window
    distinct count. The sketch runs at rsd=0.01, so 4% is a 4-sigma gate:
    at sf0.1 the worst of 720 windows measured 2.48% (a plain 2-sigma gate
    flipped on 3 windows there — the round-6 sf0.1 sweep catch), while a
    genuine sketch regression blows straight past 4 sigma. Estimates are
    deterministic for fixed input, so the boolean is hash-stable (same
    contract as approx_count_distinct_bounds).
    The streaming twin runs the identical transform incrementally; HLL
    sketch-merge is batch-boundary-insensitive, so the estimates agree
    exactly (tests/test_streaming.py::test_window_unique_users_stream)."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    approx = P.window_unique_users(t["events"])
    exact = (
        t["events"]
        .groupBy(F.window("ts", P.TUMBLE).alias("w"))
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .select(F.col("w.start").alias("window_start"), "exact_users")
    )
    return (
        exact.join(approx, "window_start")
        .select(
            "window_start",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
                <= 0.04
            ).alias("within_4pct"),
        )
        .orderBy("window_start")
    )


DRIFT_BINS_ORACLE = """
SELECT to_timestamp(floor(epoch(ts))::BIGINT // 3600 * 3600)::TIMESTAMP AS window_start,
       event_type,
       least(CAST(floor(value / 20.0) AS BIGINT), 9) AS bin,
       count(*) AS n
FROM events
WHERE event_type IN ('view', 'click') AND value >= 0
GROUP BY 1, 2, 3
ORDER BY window_start, event_type, bin
"""


@register("stream_drift_bins", DRIFT_BINS_ORACLE, tags=("streaming", "window", "drift"))
def stream_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed drift-bin table (streaming/pipelines.windowed_drift_bins on
    the batch table; identical plan under readStream): the mergeable
    per-window PSI input — events_psi_drift consumes the corpus-level
    version of these bins. Streaming equality is pinned by
    tests/test_streaming.py::test_drift_bins_stream_equals_batch."""
    t = load_tables(spark, sf_dir)
    return P.windowed_drift_bins(t["events"]).orderBy("window_start", "event_type", "bin")


CDC_STATE_ORACLE = """
WITH changelog AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM changelog
)
SELECT user_id,
       CASE WHEN op = 'D' THEN NULL ELSE value END AS current_value,
       ts AS last_ts, n_changes, op = 'D' AS deleted
FROM latest WHERE rn = 1
ORDER BY user_id
"""


@register("stream_cdc_state", CDC_STATE_ORACLE, tags=("streaming", "cdc", "stateful"))
def stream_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the streaming CDC apply (pipelines.cdc_latest_state):
    per-key latest-writer-wins with delete tombstones carried as a
    `deleted` flag rather than a retraction — the update-mode contract.
    The incremental path keeps (ts, event_id, value, deleted, n_changes)
    in keyed state and folds each micro-batch's per-key maximum into it;
    tests/test_streaming.py::test_cdc_state_stream_equals_batch pins that
    the drained stream's final emission per key equals this plan's output.
    Differs from governance.cdc_apply_changelog (the MERGE result, which
    DROPS tombstoned keys): this is the feed a downstream MERGE consumes."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wc = W.partitionBy("user_id")
    return (
        t["events"]
        .select(
            "user_id", "ts", "event_id", "value",
            (F.col("event_id") % 10 == 0).alias("deleted"),
        )
        .select(
            "*",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_changes"),
        )
        .where("rn = 1")
        .select(
            "user_id",
            F.when(F.col("deleted"), F.lit(None)).otherwise(F.col("value")).alias("current_value"),
            F.col("ts").alias("last_ts"),
            "n_changes",
            "deleted",
        )
        .orderBy("user_id")
    )


HEAVY_USERS_ORACLE = f"""
SELECT to_timestamp(floor(epoch(ts))::BIGINT // 3600 * 3600)::TIMESTAMP AS window_start,
       user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
HAVING count(*) >= {P.HEAVY_USER_MIN}
ORDER BY window_start, user_id
"""


@register("stream_heavy_users", HEAVY_USERS_ORACLE, tags=("streaming", "window", "heavy"))
def stream_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of pipelines.windowed_heavy_users: per-hour users over
    the {P.HEAVY_USER_MIN}-event rate threshold. The threshold-gate (not
    top-k) form is deliberate — counts merge across micro-batches and late
    data, where a top-k would need per-window sorted state; the flagged
    set is then small enough to rank exactly in batch. Streaming equality
    is pinned by tests/test_streaming.py::test_heavy_users_stream_equals_batch."""
    t = load_tables(spark, sf_dir)
    return P.windowed_heavy_users(t["events"]).orderBy("window_start", "user_id")
