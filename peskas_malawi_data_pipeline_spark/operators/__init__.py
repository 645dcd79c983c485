from . import relational, joins, aggregates, structural, validation, dedup, similarity, multimodal

__all__ = [
    "relational", "joins", "aggregates", "structural", "validation",
    "dedup", "similarity", "multimodal",
]
