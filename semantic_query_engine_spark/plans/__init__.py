from .rag import rag_ask

__all__ = ["rag_ask"]
