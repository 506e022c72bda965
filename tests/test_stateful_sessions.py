"""Stateful streaming sessionization ≡ batch window sessionization.

The stream replays the events table over MULTIPLE micro-batches (time-
ordered files) so group state genuinely carries open sessions across
batches; at termination the per-user final session is still open in
state, so the differential compares closed sessions only.
"""

import uuid

import pytest
from pyspark.sql import functions as F

from archvisier_spark.streaming.sessions import (
    batch_user_sessions,
    stream_user_sessions,
)

SF_DIR = "/root/testdata/sf0.001"
GAP = 1800


@pytest.fixture(scope="module")
def events_files(spark, tmp_path_factory):
    """Events re-written as 4 time-ordered files → 2 micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("ts")
    n = ev.count()
    # contiguous time ranges per file so state must carry across batches
    ranked = ev.withColumn("part", F.ntile(4).over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("ts")))
    for p in range(1, 5):
        ranked.filter(F.col("part") == p).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(out)
    return out, n


def test_stateful_sessions_equal_batch(spark, events_files, tmp_path):
    events_path, _ = events_files
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        stream_user_sessions(spark, events_path, gap_seconds=GAP)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    batch = batch_user_sessions(
        spark.read.parquet(events_path), gap_seconds=GAP
    ).collect()
    # drop each user's LAST session — it is still open in stream state
    last_per_user = {}
    for r in batch:
        key = r["user_id"]
        if key not in last_per_user or r["session_start"] > last_per_user[key]["session_start"]:
            last_per_user[key] = r
    closed = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], round(r["total_value"], 6))
        for r in batch
        if last_per_user[r["user_id"]] is not r
    }
    assert streamed == closed
    assert len(streamed) > 0, "replay must close at least one session"
