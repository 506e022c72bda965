"""Structured-Streaming surface (SURVEY.md §2.10).

The reference's nearest streaming analogs are a page-progress event queue
and cancel-between-units; their Spark-native forms are (a) the SAME
extraction transform bound to ``readStream`` (micro-batch = the reference's
per-batch progress granularity) and (b) watermarked tumbling-window
aggregation over the events table.
"""
