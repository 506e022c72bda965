"""Pure-Python XXH64 must be value-identical to Spark's xxhash64 — it is
what lets the simhash/fingerprint oracles embed engine-equal token hashes
as SQL literals."""

import random
import string

import pandas as pd
from pyspark.sql import functions as F

from archvisier_spark.kernel.hashing import xxh64, xxhash64_long, xxhash64_string


def test_xxh64_reference_vectors():
    # spec sanity: empty input, seed 0 — the published XXH64 test vector
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    # determinism + seed sensitivity
    assert xxh64(b"archvisier") == xxh64(b"archvisier")
    assert xxh64(b"archvisier", seed=0) != xxh64(b"archvisier", seed=42)


def test_xxhash64_matches_spark(spark):
    rng = random.Random(11)
    strs = ["", "a", "ab", "abc", "data", "żółć gęślą jaźń", "x" * 3,
            "y" * 4, "z" * 7, "w" * 8, "v" * 31, "u" * 32, "t" * 33,
            "s" * 100] + [
        "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 200)))
        for _ in range(300)
    ]
    longs = [0, 1, -1, 2**62, -(2**62)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(len(strs) - 5)
    ]
    df = spark.createDataFrame(pd.DataFrame({"s": strs, "v": longs}))
    rows = df.select(
        "s", "v", F.xxhash64("s").alias("hs"), F.xxhash64("v").alias("hv")
    ).collect()
    for r in rows:
        assert xxhash64_string(r["s"]) == r["hs"], repr(r["s"])
        assert xxhash64_long(r["v"]) == r["hv"], r["v"]
