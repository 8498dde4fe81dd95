"""Event-table (time-series) operators — batch forms.

The reference is batch-only (SURVEY.md §2C: no streaming/time-series model);
these are beyond-reference capabilities over the ``events`` table. Each batch
form here has a Structured Streaming twin in ``streaming/`` sharing the same
aggregation logic, so batch results oracle-validate the streaming operator's
semantics.

Window starts are output as epoch-second BIGINT — raw ``ts`` carries
microsecond precision that round-trips differently through engines' timestamp
renderers; epoch integers hash identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.portable import money_sum, money_sum_sql
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table


# Tumbling 1-hour window aggregation (batch twin of streaming windowed agg)
@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           {money_sum_sql('value', 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            money_sum(F.col("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


# Sliding window: 2h window sliding 1h — each event lands in 2 windows.
@query(
    "events_sliding_window",
    oracle="""
    SELECT CAST(s AS BIGINT) AS window_start, COUNT(*) AS cnt
    FROM (
        SELECT FLOOR(EPOCH(ts) / 3600) * 3600 AS b FROM events
    ), UNNEST([b, b - 3600]) AS t(s)
    GROUP BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").cast("long").alias("window_start"), "cnt")
    )


# Per-user behavioural stats
@query(
    "events_user_stats",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           {money_sum_sql('value', 4)} AS total_value
    FROM events GROUP BY user_id
    """,
)
def events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        money_sum(F.col("value"), 4).alias("total_value"),
    )


# Sessionization (30-minute inactivity gap) — the classic stateful-stream op,
# expressed in batch as a gap-detection window chain: lag → new-session flag →
# running sum = session id. One shuffle on user_id; scales linearly.
@query(
    "events_sessionize",
    oracle="""
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start_epoch
    FROM (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("double") - prev_ts.cast("double")) > 1800),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(wsum)
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(F.min(F.col("ts")).cast("double")).cast("long").alias("session_start_epoch"),
    )


# Native session windows (F.session_window): same 30-min-gap semantics as the
# window-chain above, but expressed as a built-in streaming-capable operator.
# Oracle: the window-chain formulation in SQL — an algebraic-equivalence check
# between the two sessionization strategies.
@query(
    "events_session_window",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start_epoch
    FROM (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_seq
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via the native session_window operator. One shuffle
    on (user_id); works unchanged under Structured Streaming with a
    watermark — that is the 100 TB streaming-sessionization path.

    Boundary semantics note: session_window closes a session when the *gap
    strictly exceeds* the duration only if defined so — Spark merges events
    whose windows overlap: [t, t+30m) ∪ [t', ...) merge iff t' < t+30m, i.e.
    a gap of exactly 30m starts a NEW session; the LAG-chain oracle uses
    `> 1800` which KEEPS a gap of exactly 30m. The testdata's microsecond
    timestamps make an exact-1800.000000s gap impossible, so both agree.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.floor(F.col("w.start").cast("double")).cast("long").alias("session_start_epoch"),
        )
    )
