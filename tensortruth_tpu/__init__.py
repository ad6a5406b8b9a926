"""tensortruth_tpu — TPU-native index-and-query engine.

A from-scratch JAX/XLA/Pallas re-design of the retrieval core of
``ljubobratovicrelja/tensor-truth`` (see SURVEY.md): hierarchical chunk
indexes with auto-merging retrieval, a Flax BGE-M3-architecture embedder, a
Pallas fused matmul+top-k cosine kernel over an HBM-resident embedding
matrix (shardable across a TPU mesh), and a cross-encoder rerank stage.
"""

__version__ = "0.2.1"
