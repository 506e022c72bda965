"""Year-scoped counter keys + per-mode display patterns (A2 session tier).

Reference semantics: session counters keyed ``"{work_mode}/{year}"`` with
SA mode in a SEPARATE dict (gui/pdf_processor_app.py:590-616), rendered
with the TYPE_PATTERNS literals ``KP/{num}/{year}`` / ``KW/{num}/{year}``
/ ``SA{num}_{year}`` (gui/constants.py:9-13).  The Spark form
(pipeline.extract.with_display_numbers) is differential-tested against
the sequential counter loop here; per-row SQL parity of the underlying
two-phase numbering is oracle-checked by the a2_counter_display query.
"""

from archvisier_spark.kernel.naming import (
    TYPE_PATTERNS,
    counter_key,
    display_number,
    next_display_number,
)


def test_display_patterns_golden():
    # gui/constants.py:9-13 literals
    assert TYPE_PATTERNS == {
        "KP": "KP/{num}/{year}",
        "KW": "KW/{num}/{year}",
        "SA": "SA{num}_{year}",
    }
    assert display_number("KP", 5, 2025) == "KP/5/2025"
    assert display_number("KW", 12, 2024) == "KW/12/2024"
    assert display_number("SA", 5, 2025) == "SA5_2025"


def test_counter_key_literal():
    assert counter_key("KP", 2025) == "KP/2025"


def test_sequential_counters_sa_separate():
    counters: dict = {}
    sa: dict = {}
    assert next_display_number("KP", 2025, counters, sa) == "KP/1/2025"
    assert next_display_number("KP", 2025, counters, sa) == "KP/2/2025"
    assert next_display_number("KP", 2024, counters, sa) == "KP/1/2024"  # per-year restart
    assert next_display_number("SA", 2025, counters, sa) == "SA1_2025"   # separate dict
    assert next_display_number("KP", 2025, counters, sa) == "KP/3/2025"
    assert counters == {"KP/2025": 3, "KP/2024": 1}
    assert sa == {"SA/2025": 1}


def test_spark_display_numbers_match_sequential_loop(spark):
    from archvisier_spark.corpus import corpus_df, generate_rows
    from archvisier_spark.pipeline.extract import with_display_numbers

    n = 50
    docs = corpus_df(spark, n, seed=11, skew_every=10, skew_factor=5, partitions=4)

    for mode in ("KP", "SA"):
        got = {
            r["url"]: (r["lp_year"], r["display_number"])
            for r in with_display_numbers(
                docs.select("url", "warc_ts"), work_mode=mode
            ).collect()
        }
        counters: dict = {}
        sa: dict = {}
        rows = sorted(generate_rows(n, seed=11, skew_every=10, skew_factor=5),
                      key=lambda r: r["url"])
        for row in rows:
            year = row["warc_ts"].year
            disp = next_display_number(mode, year, counters, sa)
            bucket = sa if mode == "SA" else counters
            lp = bucket[counter_key(mode, year)]
            assert got[row["url"]] == (lp, disp), row["url"]


def test_with_sequence_matches_plain_window_at_sampling_scale(spark):
    """Regression: RangePartitioning samples split points per execution, so
    with_sequence must pin ONE materialisation of its key slice — without
    that, the offsets job and the re-attach join can disagree and lp values
    silently gap/duplicate (caught at 2000 rows; invisible at 60)."""
    from pyspark.sql import Window, functions as F

    from archvisier_spark.pipeline.numbering import with_sequence

    df = spark.range(5000).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("key"),
        (F.col("id") % 7).alias("grp"),
    )
    got = with_sequence(df, order_col="key", partition_cols=("grp",), out_col="lp")
    w = Window.partitionBy("grp").orderBy("key")
    want = df.withColumn("lp", F.row_number().over(w).cast("long"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_keys_df_prepass_equivalent(spark):
    """keys_df (pruned-column pre-pass) must yield identical numbering."""
    from archvisier_spark.corpus import corpus_df
    from archvisier_spark.pipeline.extract import with_display_numbers

    docs = corpus_df(spark, 30, seed=3, skew_every=9, skew_factor=4, partitions=3)
    plain = with_display_numbers(docs.select("url", "warc_ts"), work_mode="KW")
    via_keys = with_display_numbers(
        docs.select("url", "warc_ts"), work_mode="KW", keys_df=docs
    )
    a = {r["url"]: r["display_number"] for r in plain.collect()}
    b = {r["url"]: r["display_number"] for r in via_keys.collect()}
    assert a == b
