"""Reusable column-expression builders (the engine's "function library").

Everything here is a pure Column constructor — JVM-side, codegen-friendly,
no UDFs — so any query can compose the engine's kernels the way
``pyspark.sql.functions`` composes built-ins.
"""

from archvisier_spark.functions.columns import (  # noqa: F401
    cosine_similarity_col,
    lang_heuristic_col,
    token_jaccard_set_col,
    token_jaccard_multiset_col,
    levenshtein_col,
    needs_value_col,
    header_col,
)
