from . import (
    clustering,
    codecs,
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
    "codecs",
    "multimodal",
    "sampling",
    "similarity",
    "sketches",
    "temporal",
    "text",
    "textprep",
]
