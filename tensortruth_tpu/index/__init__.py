from tensortruth_tpu.index.nodes import Node, HierarchyStore
from tensortruth_tpu.index.chunker import (
    ChunkingStrategy,
    hierarchical_chunk,
    semantic_chunk,
    semantic_hierarchical_chunk,
    chunk_document,
)

__all__ = [
    "Node",
    "HierarchyStore",
    "ChunkingStrategy",
    "hierarchical_chunk",
    "semantic_chunk",
    "semantic_hierarchical_chunk",
    "chunk_document",
]
