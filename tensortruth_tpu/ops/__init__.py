from tensortruth_tpu.ops.topk import exact_topk, fused_topk

__all__ = ["exact_topk", "fused_topk"]
