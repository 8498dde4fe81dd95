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


# JSON property extraction (semi-structured column surface)
@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the props column — JSON stays a string at rest
    (schema-on-read); extraction is a codegen'd path expression, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# As-of join — a custom operator Spark lacks as a primitive (SURVEY §2C lists
# it absent in the reference too; added as a beyond-reference capability).
@query(
    "asof_join_last_order",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST(FLOOR(EPOCH(e.ts)) AS BIGINT) AS ts_epoch,
           o.o_orderkey AS last_orderkey
    FROM events e
    ASOF JOIN (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at or
    before the event time.

    Implementation is the scalable union-merge form, NOT a range join: tag
    both streams, union, and carry the last order key forward with
    last(ignorenulls) over (key, time) — one shuffle on the key, linear in
    rows, no (event x order) intermediate blow-up. Orders are first deduped
    to one row per (custkey, date) (max orderkey) so tie-breaks are
    deterministic on both engines; the oracle is DuckDB's native ASOF JOIN,
    making this an independent-implementation equivalence check.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").cast("long").alias("k"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
            "o_orderkey",
        )
    )
    merged = ev.select("k", "t", "is_event", "event_id", F.lit(None).cast("long").alias("o_orderkey")).unionByName(
        orders.select("k", "t", "is_event", "event_id", "o_orderkey")
    )
    # order rows sort before event rows at equal t => 'at or before' semantics
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
    return (
        carried.filter((F.col("is_event") == 1) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.floor(F.col("t").cast("double")).cast("long").alias("ts_epoch"),
            "last_orderkey",
        )
    )


# Sessionization (30-minute inactivity gap) — the classic stateful-stream op,
# expressed in batch as a gap-detection window chain: lag → new-session flag →
# running sum = session id. One shuffle on user_id; scales linearly.
#
# ONE chain definition serves both sessionization oracles (events_sessionize
# and events_session_window's algebraic-equivalence check) — two inline
# copies could drift in gap constant or tie-break and silently hollow out
# the equivalence claim. ``select`` is the outer projection/grouping.
def _session_chain_sql(select: str) -> str:
    return f"""
    {select}
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
    """


@query(
    "events_sessionize",
    oracle=_session_chain_sql(
        "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,"
        " COUNT(*) AS n_events,"
        " CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start_epoch"
    ),
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
    oracle=_session_chain_sql(
        "SELECT user_id, COUNT(*) AS n_events,"
        " CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start_epoch"
    ),
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


# Range (interval) join — purchases within 10 minutes after a click by the
# same user. The equi-key (user_id) carries the shuffle; the time interval is
# evaluated as a join residual, so this stays a hash/SMJ join, NOT a cartesian
# BroadcastNestedLoop — the difference between O(n·m) and O(n+m) per key at
# 100 TB. (Spark 3.x+ would also accept a point-in-interval range-join hint;
# with an equi-key present it is unnecessary.)
@query(
    "range_join_events",
    oracle="""
    SELECT c.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "events_json_struct",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
    """,
)
def events_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema — the scalable JSON path: the
    document parses ONCE into a typed struct column, and every downstream
    field access/filter is a struct projection (vs get_json_object, which
    re-parses per extraction). With many extracted fields this is the
    difference between 1 and N parses per row at 100 TB; Catalyst also
    prunes unread struct fields from the parse."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.filter(F.col("p.k") > 90)
        .select("event_id", "event_type", F.col("p.k").alias("k"))
    )


# Product-analytics conversion funnel: signup -> click -> purchase by
# first-occurrence ordering. One groupBy(user_id) computes the three
# conditional first-timestamps (map-side partial MIN), then a 1-row aggregate
# counts stage survivors — two shuffles total, both shrinking, at any scale.
@query(
    "events_conversion_funnel",
    oracle="""
    SELECT COUNT(first_signup) AS n_signup,
           CAST(SUM(CASE WHEN first_click > first_signup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click_after_signup,
           CAST(SUM(CASE WHEN first_click > first_signup AND first_purchase > first_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_funnel
    FROM (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    """,
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage survivor counts for the signup -> click -> purchase funnel
    (first-occurrence ordering per user). Timestamps never leave the plan —
    only counts are output, so engine timestamp representation is moot."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return per_user.agg(
        F.count("first_signup").alias("n_signup"),
        F.sum(
            F.when(F.col("first_click") > F.col("first_signup"), 1).otherwise(0)
        ).alias("n_click_after_signup"),
        F.sum(
            F.when(
                (F.col("first_click") > F.col("first_signup"))
                & (F.col("first_purchase") > F.col("first_click")),
                1,
            ).otherwise(0)
        ).alias("n_purchase_funnel"),
    )


# Per-user anomaly detection: standardize each event's value against its
# user's own distribution (window aggregates over the user partition — one
# shuffle, no join-back) and flag |z| > 2 outliers. Stddev is computed from
# exact power sums so both engines derive the identical double; z-scores are
# floor-truncated at 1e-6 (see oracle-determinism conventions).
@query(
    "events_zscore_anomaly",
    oracle="""
    SELECT event_id, user_id,
           floor((v - mu) / sigma * 1e6) / 1e6 AS zscore
    FROM (
      SELECT event_id, user_id,
             CAST(vd AS DOUBLE) AS v,
             CAST(SUM(vd) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS mu,
             CASE WHEN COUNT(*) OVER w > 1 THEN
               sqrt(greatest(0.0,
                    (CAST(SUM(vd * vd) OVER w AS DOUBLE)
                     - CAST(SUM(vd) OVER w AS DOUBLE)
                       * CAST(SUM(vd) OVER w AS DOUBLE) / (COUNT(*) OVER w))
                    / (COUNT(*) OVER w - 1)))
             END AS sigma
      FROM (SELECT event_id, user_id, CAST(value AS DECIMAL(18,4)) AS vd FROM events)
      WINDOW w AS (PARTITION BY user_id)
    )
    WHERE sigma > 0 AND abs((v - mu) / sigma) > 2
    """,
)
def events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is a >2-sigma outlier within their own user's
    history. The power sums run over decimal(18,4) so they are exact and
    order-independent (see functions.portable — raw double window sums vary
    with partition split order and would flip marginal |z|>2 rows between
    engines); every subsequent double op is deterministic IEEE on identical
    inputs. One unbounded window over the user partition — at 100 TB a
    single shuffle on user_id, no self-join."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(18,4)")
    d = ev.select("event_id", "user_id", vd.alias("vd"))
    w = Window.partitionBy("user_id")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("vd").over(w).cast("double")
    s2 = F.sum(F.col("vd") * F.col("vd")).over(w).cast("double")
    mu = s1 / n
    # greatest(0, ...): the cancellation (s2 - s1²/n) can round to a tiny
    # NEGATIVE double on a constant-value partition, where DuckDB's sqrt
    # RAISES while Spark's returns NaN — the clamp makes both engines emit
    # sigma = 0, which the sigma > 0 filter then drops identically
    sigma = F.when(
        n > 1, F.sqrt(F.greatest(F.lit(0.0), (s2 - s1 * s1 / n) / (n - 1)))
    )
    z = (F.col("vd").cast("double") - mu) / sigma
    return (
        d.select("event_id", "user_id", F.col("vd").cast("double").alias("v"),
                 mu.alias("mu"), sigma.alias("sigma"))
        .filter((F.col("sigma") > 0) & (F.abs((F.col("v") - F.col("mu")) / F.col("sigma")) > 2))
        .select(
            "event_id",
            "user_id",
            (F.floor((F.col("v") - F.col("mu")) / F.col("sigma") * 1e6) / 1e6).alias("zscore"),
        )
    )


# Cohort retention matrix: users grouped by first-activity week, counted per
# week offset. Weeks are integer epoch-day arithmetic (epoch_days // 7) so
# both engines bucket identically with no calendar/locale semantics. Shape:
# one groupBy(user) for cohort assignment, one distinct + groupBy for the
# matrix — all keys low-cardinality after the first aggregate.
@query(
    "events_retention_cohorts",
    oracle="""
    WITH ud AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      FROM events GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800
    ),
    cohorts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ud GROUP BY user_id)
    SELECT c.cohort_wk, u.wk - c.cohort_wk AS week_offset,
           COUNT(*) AS n_active_users
    FROM ud u JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: for each cohort (week of first activity),
    how many of its users were active 0, 1, 2... weeks later. ud is already
    distinct per (user, week), so COUNT(*) counts users exactly once per
    cell. The cohort table is per-user (small after aggregation) and joins
    back broadcast-or-shuffled on user_id — at 100 TB both aggregates are
    map-side-partial shuffles on user_id and the matrix itself is tiny."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr("unix_timestamp(ts) div 604800")
    ud = ev.select("user_id", wk.alias("wk")).distinct()
    cohorts = ud.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ud.join(cohorts, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


# Inter-arrival gap statistics per user: lag window + integer epoch-second
# diffs -> exact aggregates (mean gap emitted as an exact integer-ratio
# double). One window + one groupBy, both on user_id — a single shuffle
# since the partitioning is reused across the two.
@query(
    "events_interarrival_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS n_gaps,
           MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s,
           CAST(SUM(gap_s) AS DOUBLE) / COUNT(*) AS mean_gap_s
    FROM (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap stats (burstiness / bot-detection signal).
    Gaps are integer epoch-second diffs ordered by (ts, event_id) — unique
    tie-break, exact arithmetic; the mean is an exact int-sum over count
    division, deterministic IEEE in both engines."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    es = F.expr("unix_timestamp(ts)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", (es - F.lag(es).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        (F.sum("gap_s").cast("double") / F.count(F.lit(1))).alias("mean_gap_s"),
    )


@query(
    "events_cdc_latest",
    oracle="""
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS last_ts,
           event_type AS last_event_type,
           floor(value * 1e6) / 1e6 AS last_value
    FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/SCD latest-state snapshot: the newest event per entity, with a
    deterministic (ts, event_id) tie-break — the compaction read every
    change-data pipeline serves ("current state of each user/row"), and
    the batch dual of a streaming upsert sink.

    Scale shape: one row_number window per user_id partition (bounded
    per-entity width; the key shuffle is the unavoidable minimum), then a
    rank-1 filter — Spark pushes it down as WindowGroupLimit, so each
    partition keeps a single row instead of sorting and discarding. The
    float value is floor-gridded at 1e-6 (repo convention for raw double
    columns crossing the comparator)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").cast("long").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            (F.floor(F.col("value") * 1e6) / 1e6).alias("last_value"),
        )
    )
