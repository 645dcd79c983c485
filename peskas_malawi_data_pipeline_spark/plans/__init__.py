from . import ingest, preprocess, validate, merge, export

__all__ = ["ingest", "preprocess", "validate", "merge", "export"]
