from . import ingest_stream, stateful

__all__ = ["ingest_stream", "stateful"]
