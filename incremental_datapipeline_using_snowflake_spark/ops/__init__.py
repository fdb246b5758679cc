from . import (
    clustering,
    codecs,
    dedup,
    graph,
    multimodal,
    quality,
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
    "quality",
    "sampling",
    "similarity",
    "sketches",
    "temporal",
    "text",
    "textprep",
]
