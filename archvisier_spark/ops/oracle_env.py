"""Where the DuckDB value-oracle generators find the driver corpus.

The literal-embedding oracles (simhash token hashes, rolling
fingerprints, K5 stub vectors, …) need to read the SAME parquet the
driver's correctness harness queries.  The path is sourced from the
environment — never hardcoded into module bodies — so (a) executors that
re-import an ops module (cloudpickle by-reference pandas_udfs) never
touch the driver's disk layout, and (b) a different harness scale is one
env var away (round-3 ADVICE).
"""

from __future__ import annotations

import os

_DEFAULT_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


def driver_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _DEFAULT_SF_DIR)
