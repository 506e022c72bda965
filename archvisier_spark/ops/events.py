"""Event-stream operators over the ``events`` table.

Batch forms of the streaming surface (SURVEY.md §2.10): tumbling-window
aggregation, retention (A5), progress-style counters (A6/A2), argmax per
key (T3/J3).  The Structured-Streaming versions of the same transforms
live in archvisier_spark.streaming and are differential-tested against
these batch results.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _events(spark, sf_dir):
    from archvisier_spark.ops.io_util import read_table

    return read_table(spark, sf_dir, "events")


# --- tumbling hourly window counts (streaming analog) ---

def q_hourly_counts(spark, sf_dir):
    # r07 (guide §2.3 "aggregate before you shuffle" applied to expression
    # placement): group on the truncated TIMESTAMP and render the display
    # string AFTER aggregation — date_format then runs once per result
    # group (~thousands) instead of once per event row (millions).  The
    # format is injective on hour-truncated timestamps in the session's
    # fixed UTC zone, so the groups — and the emitted strings — are
    # identical to formatting before the groupBy.
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("__hour_ts"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("__hour_ts", "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# --- A5 retention: keep last 3 events per user ---

def q_retention_last3(spark, sf_dir):
    # r07: same shape fix as tpch_top3_orders_per_customer — repartition
    # by the window key so the sort runs parallel instead of on the
    # single-row-group scan task; the window reuses the exchange.
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value").repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_kept"), F.round(F.sum("value"), 2).alias("kept_value"))
    )


_RETENTION_SQL = """
SELECT user_id, count(*) AS n_kept, round(sum(value), 2) AS kept_value
FROM (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 3
GROUP BY user_id
"""


# --- T3/J3 argmax: most valuable event type per user ---

def q_argmax_event(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.expr("max_by(event_type, struct(value, event_id))").alias("top_event_type"),
        F.round(F.max("value"), 2).alias("top_value"),
    )


_ARGMAX_SQL = """
SELECT user_id,
       min(CASE WHEN rn = 1 THEN event_type END) AS top_event_type,
       round(max(value), 2) AS top_value
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id DESC) AS rn
  FROM events
)
GROUP BY user_id
"""


# --- rolling window frames (§2.9 beyond the default spec) ---

def q_rolling_value(spark, sf_dir):
    """Per-user rolling 3-event average (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW) — explicit frame specs, the window shape event-stream
    feature pipelines need."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("rolling_avg3"),
        F.count("*").over(w).alias("window_n"),
    )


_ROLLING_SQL = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS rolling_avg3,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS window_n
FROM events WHERE user_id < 20
"""


# --- exact distinct counting (dedup accounting tier) ---

def q_distinct_users(spark, sf_dir):
    """Exact per-type distinct-user counts — countDistinct expands to the
    two-shuffle exact plan (distinct on (type, user) then count), the
    accounting shape dedup reports need."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct_users"),
        F.count("*").alias("n_events"),
    )


_DISTINCT_USERS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_distinct_users,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# --- semi-structured props: JSON parse + aggregate (X16 scale analog) ---

def q_props_json(spark, sf_dir):
    """Parse the JSON ``props`` column with the native ``from_json``
    (schema-on-read over semi-structured payloads — the scale analog of
    the X16 JSON plumbing) and aggregate the extracted field."""
    from pyspark.sql import types as T

    ev = _events(spark, sf_dir)
    k = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_parsed"),
            F.sum("k").alias("k_sum"),
            F.round(F.avg("k"), 4).alias("k_avg"),
        )
    )


_PROPS_JSON_SQL = """
SELECT event_type,
       count(k) AS n_parsed,
       sum(k)::BIGINT AS k_sum,
       round(avg(k), 4) AS k_avg
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


# --- A8 error collection: errors are rows, never failures ---

def q_error_rates(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 3).alias("avg_value"),
    )


_ERROR_RATES_SQL = """
SELECT event_type, count(*) AS n, round(avg(value), 3) AS avg_value
FROM events GROUP BY event_type
"""


QUERIES = {
    "events_hourly_counts": q_hourly_counts,
    "events_retention_last3": q_retention_last3,
    "events_argmax_event": q_argmax_event,
    "events_rolling_avg": q_rolling_value,
    "events_distinct_users": q_distinct_users,
    "events_props_json": q_props_json,
    "events_error_rates": q_error_rates,
}

ORACLES = {
    "events_props_json": _PROPS_JSON_SQL,
    "events_hourly_counts": _HOURLY_SQL,
    "events_retention_last3": _RETENTION_SQL,
    "events_argmax_event": _ARGMAX_SQL,
    "events_rolling_avg": _ROLLING_SQL,
    "events_distinct_users": _DISTINCT_USERS_SQL,
    "events_error_rates": _ERROR_RATES_SQL,
}
