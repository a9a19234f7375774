"""Scalar/column expression library — all JVM-side built-ins, no Python UDFs
in the hot path."""

from statline_bq_spark.functions.cleaning import (  # noqa: F401
    clean_description,
    clean_python_name,
    rename_dotted_columns,
)
from statline_bq_spark.functions.text import (  # noqa: F401
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
)
from statline_bq_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
