from . import cache, chunking, dedup, retrieval

__all__ = ["cache", "chunking", "dedup", "retrieval"]
