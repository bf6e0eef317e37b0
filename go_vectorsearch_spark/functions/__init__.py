from go_vectorsearch_spark.functions.vector import (
    as_double,
    cosine_similarity,
    dequantize,
    dot,
    l2_norm,
    l2_normalize,
    quantize,
    vector_mean,
    vector_range,
)

__all__ = [
    "as_double",
    "cosine_similarity",
    "dequantize",
    "dot",
    "l2_norm",
    "l2_normalize",
    "quantize",
    "vector_mean",
    "vector_range",
]
