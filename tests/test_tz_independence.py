"""Timestamp queries must not depend on the session timezone.

The driver builds its OWN SparkSession (no guaranteed
spark.sql.session.timeZone=UTC), so every oracle-checked query that
formats or compares timestamps has to produce identical results under any
session TZ.  The testdata parquet files carry TIMESTAMP WITHOUT TIME ZONE
(pyarrow timestamp[us], isAdjustedToUTC=false), which Spark ≥3.4 reads as
TIMESTAMP_NTZ — wall-clock values with no zone conversion anywhere — and
DuckDB reads as naive TIMESTAMP: the two engines agree by construction.
This test pins that property so a regression (e.g. a cast through
TIMESTAMP_LTZ, or an explicit from_unixtime) is caught.
"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

TZ_QUERIES = ["events_hourly_counts", "tpch_pricing_summary", "tpch_latest_orders"]


@pytest.fixture()
def ny_tz(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def test_timestamps_read_as_ntz(spark):
    from pyspark.sql.types import TimestampNTZType

    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)


@pytest.mark.parametrize("name", TZ_QUERIES)
def test_results_identical_under_non_utc_session_tz(spark, ny_tz, name):
    from archvisier_spark.ops import all_queries

    q = all_queries()[name]
    df = q(ny_tz, SF)
    cols = df.columns
    got = df.toPandas().sort_values(by=cols).reset_index(drop=True)

    import duckdb

    from archvisier_spark.ops import all_oracles

    con = duckdb.connect()
    for t in ["events", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = (
        con.execute(all_oracles()[name])
        .fetchdf()[cols]
        .sort_values(by=cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(str), want.astype(str))
