from . import (
    clustering,
    dedup,
    graph,
    multimodal,
    sampling,
    similarity,
    sketches,
    temporal,
    text,
    textprep,
)

__all__ = [
    "clustering",
    "dedup",
    "graph",
    "multimodal",
    "sampling",
    "similarity",
    "sketches",
    "temporal",
    "text",
    "textprep",
]
