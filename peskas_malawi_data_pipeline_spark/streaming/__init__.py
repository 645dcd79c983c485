from . import ingest_stream

__all__ = ["ingest_stream"]
