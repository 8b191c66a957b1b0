from .jobs import read_events_stream, run_to_memory

__all__ = ["read_events_stream", "run_to_memory"]
