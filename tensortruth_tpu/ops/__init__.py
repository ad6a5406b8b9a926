from tensortruth_tpu.ops.attention import attention_reference, blocked_attention
from tensortruth_tpu.ops.ivf import IVFIndex, build_ivf, ivf_search
from tensortruth_tpu.ops.topk import exact_topk, fused_topk, topk_search

__all__ = [
    "attention_reference",
    "blocked_attention",
    "IVFIndex",
    "build_ivf",
    "ivf_search",
    "exact_topk",
    "fused_topk",
    "topk_search",
]
