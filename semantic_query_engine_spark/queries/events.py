"""Event-stream analytics in batch form: tumbling-window rollups,
sessionization, and the as-of join (SURVEY §2 Part B streaming/window
rows; the true streaming variants live in queries/streaming_q.py).

All plans are single-shuffle (keyed by user_id or the group keys) —
the shapes that survive a 100-TB event log, where per-user state must
never leave its partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .registry import register

_TS_FMT_S = "yyyy-MM-dd HH:mm:ss"
_DTS_FMT_S = "%Y-%m-%d %H:%M:%S"


@register(
    "events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling hourly rollup (batch form of the streaming window agg)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("sum_value"),
    )


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800 THEN 1 ELSE 0 END AS new_sess
      FROM events),
    numbered AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '{_DTS_FMT_S}') AS session_start,
           strftime(MAX(ts), '{_DTS_FMT_S}') AS session_end
    FROM numbered GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag-gap islands (30-min inactivity): the
    classic two-window + one-agg plan; everything stays partitioned by
    user_id, so it is ONE shuffle end-to-end."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_sess", F.when(gap_s > 1800, F.lit(1)).otherwise(F.lit(0))
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT_S).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT_S).alias("session_end"),
    )


@register(
    "rollup_hourly_daily",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents,
             MIN(value) AS min_v, MAX(value) AS max_v
      FROM events GROUP BY 1, 2)
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value,
           MIN(min_v) AS min_value, MAX(max_v) AS max_value
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the DAILY rollup is
    re-aggregated FROM the HOURLY rollup, not from raw events — every
    aggregate is algebraic (sum of sums, sum of counts, min of mins,
    max of maxes), so each resolution reads the one below it.  At
    100 TB the raw log is touched once per hour-partition; the daily/
    weekly/monthly ladder aggregates frames that are orders of
    magnitude smaller (the TimescaleDB continuous-aggregate idea as a
    two-level declarative plan; materialize the hourly level with
    foreachBatch incrementally in the streaming variant)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.sum("n").alias("n_events"),
        (F.sum("cents") / 100.0).alias("total_value"),
        F.min("min_v").alias("min_value"),
        F.max("max_v").alias("max_value"),
    )


@register(
    "asof_join",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'signup' THEN ts END AS sig_ts
      FROM events WHERE event_type IN ('signup', 'purchase')),
    win AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(sig_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
      FROM tagged)
    SELECT event_id, user_id,
           strftime(ts, '{_DTS_FMT_S}') AS purchase_ts,
           strftime(last_signup_ts, '{_DTS_FMT_S}') AS signup_ts
    FROM win WHERE event_type = 'purchase'
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase -> most recent prior signup, per user)
    via the union+window technique: tag both streams, sort once per key,
    carry the last non-null match forward.  No range cross-join — the
    scalable as-of shape (a range join would explode at 100 TB; this is
    one sort-based window per key)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    tagged = e.withColumn(
        "sig_ts", F.when(F.col("event_type") == "signup", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win = tagged.withColumn(
        "last_signup_ts", F.last("sig_ts", ignorenulls=True).over(w)
    )
    return win.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_S).alias("purchase_ts"),
        F.date_format("last_signup_ts", _TS_FMT_S).alias("signup_ts"),
    )


@register(
    "range_join",
    oracle="""
    WITH s AS (
      SELECT user_id AS s_user, ts AS start_ts, ts + INTERVAL 1 HOUR AS end_ts
      FROM events WHERE event_type = 'signup' AND user_id < 20),
    p AS (SELECT ts, value FROM events WHERE event_type = 'purchase')
    SELECT s_user, COUNT(*) AS n_hits,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_value
    FROM s JOIN p ON p.ts >= s.start_ts AND p.ts < s.end_ts
    GROUP BY s_user
    """,
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: every purchase (any user) falling
    inside the hour after each early user's signup, aggregated per
    signup user.  Executed as a BUCKETED interval join
    (operators/rangejoin.py): intervals explode to 15-min cells, points
    map to one cell, and the match is an EQUALITY join on the cell
    refined by the exact range — never the BroadcastNestedLoopJoin the
    naive BETWEEN predicate plans (quadratic at 100 TB).  The oracle IS
    the naive theta join, so the gate proves the bucketed rewrite is
    exact."""
    from ..operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    intervals = e.filter(
        (F.col("event_type") == "signup") & (F.col("user_id") < 20)
    ).select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    points = e.filter(F.col("event_type") == "purchase").select("ts", "value")
    j = interval_join(points, intervals, bucket_width_s=900)
    return j.groupBy("s_user").agg(
        F.count("*").alias("n_hits"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
            "sum_value"
        ),
    )


@register(
    "events_value_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
           MAX(value) AS max_value,
           ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / (100.0 * COUNT(*)), 6) AS avg_value,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user aggregate profile (the batch analog of per-key streaming
    state, SURVEY A21)."""
    e = load_table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.sum(vc) / 100.0).alias("total_value"),
        F.max("value").alias("max_value"),
        F.round(F.sum(vc) / (F.count("*") * 100.0), 6).alias("avg_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


@register(
    "conversation_history",
    oracle=f"""
    SELECT user_id, event_id,
           string_agg(event_type, ' -> ') OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS history,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS turn
    FROM events WHERE user_id < 10
    """,
)
def conversation_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key conversation memory, batch analog (SURVEY A21 — the
    reference's ConversationBufferMemory read path `buffer_as_str`,
    /root/reference/app/main.py:516): each event sees the full ordered
    history of its key accumulated up to and including itself.  One
    shuffle keyed by user_id; the streaming twin is
    stream_stateful_memory."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.array_join(F.collect_list("event_type").over(frame), " -> ").alias(
            "history"
        ),
        F.row_number().over(w).alias("turn"),
    )


@register(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
      FROM events),
    grid AS (
      SELECT t.d AS day, et.event_type
      FROM (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds),
                                          INTERVAL 1 DAY)) AS d) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events) et),
    actual AS (
      SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT strftime(g.day, '%Y-%m-%d') AS day, g.event_type,
           COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN actual a ON a.day = g.day AND a.event_type = g.event_type
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated dense (day x event_type)
    grid left-joined to actual counts, zeros for missing slots — the
    standard densification op for downstream window/trend math.  The
    grid is sequence()-generated in-plan (no driver loop) and tiny
    relative to the fact side, so it broadcasts."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(types)
    actual = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    return (
        grid.join(actual, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@register(
    "events_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(ts) AS t2 FROM events e
      JOIN s1 USING (user_id)
      WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(ts) AS t3 FROM events e
      JOIN s2 USING (user_id)
      WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
    SELECT s1.user_id,
           CAST(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS BIGINT)
             AS funnel_stage,
           strftime(t1, '{_DTS_FMT_S}') AS t_view,
           strftime(t2, '{_DTS_FMT_S}') AS t_click,
           strftime(t3, '{_DTS_FMT_S}') AS t_purchase
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: each stage's
    timestamp is the first qualifying event STRICTLY AFTER the previous
    stage (the product-analytics semantics — a click before the first
    view does not count).

    Scale shape: every stage is a groupBy(user_id) over a
    predicate-pushed scan of one event type, and every join is keyed on
    user_id — all exchanges share the same hash partitioning, so AQE
    reuses one shuffle layout end-to-end; no window over the full event
    stream, no per-user sort of unfiltered events."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.lit(1)
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            stage.cast("long").alias("funnel_stage"),
            F.date_format("t1", _TS_FMT_S).alias("t_view"),
            F.date_format("t2", _TS_FMT_S).alias("t_click"),
            F.date_format("t3", _TS_FMT_S).alias("t_purchase"),
        )
    )


@register(
    "events_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted on each subsequent active day (day_offset 0, 1, 2, ...) —
    the classic growth-analytics rollup.

    Scale shape: first-seen and distinct-activity both hash-partition
    on user_id (AQE shares the exchange), the join is user_id-keyed,
    and the final agg is over (cohort, offset) — bounded by days², not
    by events.  No window, no driver state."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "events_anomaly",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    m AS (
      SELECT event_id, event_type, cents,
             SUM(cents) OVER (PARTITION BY event_type) AS s,
             SUM(cents * cents) OVER (PARTITION BY event_type) AS s2,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c),
    z AS (
      SELECT event_id, event_type, cents,
             (cents - CAST(s AS DOUBLE) / n)
               / sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
               AS zs
      FROM m)
    SELECT event_id, event_type, cents / 100.0 AS value,
           ROUND(zs, 6) AS zscore
    FROM z WHERE abs(zs) > 3.0
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3) — the monitoring query that
    flags anomalous event values against their type's distribution.
    The moments come from EXACT integer-cents sums (sum, sum-of-
    squares, count over one orderless window per type), so mean and
    sample variance are bit-deterministic regardless of aggregation
    order — the float work happens once per row on exact inputs, which
    is what keeps a 3.0000001-vs-2.9999999 flag from flapping between
    runs or engines.  One shuffle (the per-type window); filter is
    row-local after that."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type")
    c = e.select("event_id", "event_type", cents.alias("cents"))
    m = (
        c.withColumn("s", F.sum("cents").over(w))
        .withColumn("s2", F.sum(F.col("cents") * F.col("cents")).over(w))
        .withColumn("n", F.count("*").over(w))
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    zs = (F.col("cents") - mean) / F.sqrt(var)
    return (
        m.withColumn("zs", zs)
        .filter(F.abs(F.col("zs")) > 3.0)
        .select(
            "event_id",
            "event_type",
            (F.col("cents") / 100.0).alias("value"),
            F.round("zs", 6).alias("zscore"),
        )
    )


@register(
    "events_ohlc",
    oracle=f"""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bar,
           CAST(min_by(round(value * 100)::BIGINT,
                  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                  lpad(CAST(event_id AS VARCHAR), 12, '0')) AS BIGINT) AS open_cents,
           CAST(MAX(round(value * 100)::BIGINT) AS BIGINT) AS high_cents,
           CAST(MIN(round(value * 100)::BIGINT) AS BIGINT) AS low_cents,
           CAST(max_by(round(value * 100)::BIGINT,
                  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                  lpad(CAST(event_id AS VARCHAR), 12, '0')) AS BIGINT) AS close_cents,
           COUNT(*) AS n_ticks
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (open/high/low/close + tick count) per (type, hour) —
    the time-series downsampling every metrics/market pipeline runs.
    Open/close use min_by/max_by on a lexicographic (microsecond ts,
    zero-padded event_id) ordinal, so ties are deterministic and the
    DuckDB twin orders identically; prices are exact integer cents.

    Scale shape: ONE hash aggregate keyed by (type, hour) with
    map-side partial min_by/max_by/min/max combine — the shuffle
    carries one 5-value row per bar per task, never the ticks."""
    ev = load_table(spark, sf_dir, "events")
    ordk = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("bar"),
    ).agg(
        F.min_by(cents, ordk).alias("open_cents"),
        F.max(cents).alias("high_cents"),
        F.min(cents).alias("low_cents"),
        F.max_by(cents, ordk).alias("close_cents"),
        F.count("*").alias("n_ticks"),
    )
