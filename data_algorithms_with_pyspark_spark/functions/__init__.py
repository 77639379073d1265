"""Column-expression helpers (all JVM-side, codegen-friendly)."""

from data_algorithms_with_pyspark_spark.functions.text_functions import (
    char_counts_expr,
    normalize_text,
    subword_count,
    words,
)
from data_algorithms_with_pyspark_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)

__all__ = [
    "normalize_text",
    "words",
    "char_counts_expr",
    "subword_count",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "to_double_array",
]
