from .embedder import TfIdfEmbedder, embed_with_pandas_udf
from .generator import deterministic_answer, generate_with_pandas_udf

__all__ = [
    "TfIdfEmbedder",
    "embed_with_pandas_udf",
    "deterministic_answer",
    "generate_with_pandas_udf",
]
