"""Custom stateful streaming operator: per-user sessionization.

The reference has no stateful streaming (SURVEY.md §2.10); this is the
training-data-pipeline extension the 100 TB use-case needs — event
sessionization with an inactivity gap, expressed with
``applyInPandasWithState`` (Arrow-batched state handler, the sanctioned
vehicle for stateful ops Spark lacks built-in).

Semantics: events of one user sort by time; a gap > ``gap_seconds``
closes the current session.  Closed sessions are emitted downstream;
the open session lives in the group state across micro-batches.  The
batch oracle (lag + cumulative-sum sessionization, pure window
functions) is differentially tested against this in
tests/test_stateful_sessions.py.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

# open-session carry-over between micro-batches
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ns", T.LongType(), False),
        T.StructField("last_ns", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

GAP_SECONDS = 1800  # 30-minute inactivity closes a session


def _session_fn(gap_seconds: int):
    gap_ns = gap_seconds * 1_000_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events = pd.concat(list(pdfs))
        # datetime64[ns] → int64 is NANOSECONDS
        ts_ns = events["ts"].astype("int64").sort_values().to_numpy()
        values = events.sort_values("ts")["value"].to_numpy()

        if state.exists:
            start_ns, last_ns, n_events, total_value = state.get
        else:
            start_ns, last_ns, n_events, total_value = None, None, 0, 0.0

        closed = []
        for t, v in zip(ts_ns, values):
            if start_ns is None:
                start_ns, last_ns, n_events, total_value = int(t), int(t), 1, float(v)
                continue
            if t - last_ns > gap_ns:
                closed.append((user_id, start_ns, last_ns, n_events, total_value))
                start_ns, last_ns, n_events, total_value = int(t), int(t), 1, float(v)
            else:
                last_ns, n_events, total_value = int(t), n_events + 1, total_value + float(v)

        state.update((start_ns, last_ns, n_events, total_value))
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="ns")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="ns")
        yield out

    return fn


def stream_user_sessions(
    spark: SparkSession,
    events_path: str,
    gap_seconds: int = GAP_SECONDS,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    ev = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("event_id", T.LongType(), False),
                    T.StructField("ts", T.TimestampType(), False),
                    T.StructField("user_id", T.LongType(), False),
                    T.StructField("event_type", T.StringType(), False),
                    T.StructField("value", T.DoubleType(), False),
                    T.StructField("props", T.StringType(), True),
                ]
            )
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )
    return (
        ev.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_sessions(
    events: DataFrame, gap_seconds: int = GAP_SECONDS
) -> DataFrame:
    """Batch oracle: lag + cumulative-sum sessionization (pure windows).

    Gap comparison uses interval arithmetic so it works for both
    TIMESTAMP and TIMESTAMP_NTZ inputs (ANSI casts of NTZ to long are
    rejected)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gapped = events.select("user_id", "ts", "value").withColumn(
        "new_session",
        (
            F.col("ts")
            > F.lag("ts").over(w) + F.expr(f"INTERVAL {gap_seconds} SECONDS")
        ).cast("int"),
    ).withColumn("new_session", F.coalesce("new_session", F.lit(1)))
    sessions = gapped.withColumn("session_id", F.sum("new_session").over(w))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )
