"""Distributed extraction pipeline (the Spark tier).

``extract.py``   — sniff → per-format extract → metadata cascade → spans
``numbering.py`` — scalable dense sequence numbers (the counter semantics)
``lineage.py``   — per-partition lineage/metrics rows + idempotent resume
"""
