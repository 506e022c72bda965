"""archvisier_spark — a from-scratch PySpark-native document-text extraction engine.

Re-expresses the query/data-processing capabilities of the reference
(kitajusSus/ArchVisier, read-only at /root/reference) as an idiomatic
Spark pipeline:

* ``archvisier_spark.kernel``  — pure-Python single-document oracle library
  (extraction cascade, similarity kernels, PDF/HTML parsers).  This is the
  byte-identity oracle; every function is pinned by golden literals taken
  from the reference pytest suite.
* ``archvisier_spark.corpus``  — deterministic synthetic Common-Crawl-style
  corpus generator (schema per BASELINE.json input_hint).
* ``archvisier_spark.pipeline`` — the distributed extraction job:
  byte-sniffer → per-format extract → metadata cascade → spans → lineage.
* ``archvisier_spark.ops``     — SQL-expressible operator inventory
  (SURVEY.md §2) exposed through the driver contract in __spark_entry__.py.
"""

__version__ = "0.1.0"
