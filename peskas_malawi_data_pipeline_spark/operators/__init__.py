from . import (aggregates, dedup, graph, joins, layout, multimodal, packing,
               ranking, relational, sampling, similarity, structural,
               validation)

__all__ = [
    "aggregates", "dedup", "graph", "joins", "layout", "multimodal",
    "packing", "ranking", "relational", "sampling", "similarity",
    "structural", "validation",
]
