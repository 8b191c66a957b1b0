from . import ann, cache, chunking, dedup, multimodal, retrieval, simhash

__all__ = [
    "ann",
    "cache",
    "chunking",
    "dedup",
    "multimodal",
    "retrieval",
    "simhash",
]
