"""Pure-Python single-document kernel — the byte-identity oracle.

Every function here reimplements, from its observable behaviour, one scalar
operator of the reference engine (SURVEY.md §2).  The Spark pipeline calls
these functions from inside Arrow-batched pandas UDFs; the pytest suite pins
them against the reference's golden literals.  Nothing in this package
imports Spark — it must stay importable on executors and in plain pytest.
"""

from archvisier_spark.kernel.smart import (  # noqa: F401
    DOCUMENT_TYPES,
    extract_date,
    extract_document_number,
    extract_court_signature,
    extract_sender_recipient,
    extract_subject,
    find_document_type,
    smart_extract_info,
)
from archvisier_spark.kernel.cascade import extract_info_from_text  # noqa: F401
from archvisier_spark.kernel.naming import (  # noqa: F401
    generate_new_filename,
    sanitize_filename,
)
from archvisier_spark.kernel.similarity import (  # noqa: F401
    cosine_similarity,
    fuzzy_similarity,
    fuzzy_similarity_chain,
    jaro_winkler,
    levenshtein,
    levenshtein_ratio,
    token_similarity,
)
from archvisier_spark.kernel.ner import RuleNer  # noqa: F401
from archvisier_spark.kernel.config import AppSettings, coerce_odd, load_settings  # noqa: F401
from archvisier_spark.kernel.textfix import correct_text, detect_lang  # noqa: F401
from archvisier_spark.kernel.spans import (  # noqa: F401
    detect_document_type_span,
    find_all_occurrences,
    label_spans,
)
from archvisier_spark.kernel.sniffer import sniff_format  # noqa: F401
from archvisier_spark.kernel.pdf import pdf_page_texts, build_pdf  # noqa: F401
from archvisier_spark.kernel.html_extract import extract_main_text  # noqa: F401
from archvisier_spark.kernel.document import extract_document_text  # noqa: F401
