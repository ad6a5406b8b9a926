from tensortruth_tpu.models.xlmr import (
    XLMRConfig,
    BGE_M3_CONFIG,
    BGE_RERANKER_V2_M3_CONFIG,
    init_params,
    encoder_forward,
    cls_embed,
    rerank_logits,
)

__all__ = [
    "XLMRConfig",
    "BGE_M3_CONFIG",
    "BGE_RERANKER_V2_M3_CONFIG",
    "init_params",
    "encoder_forward",
    "cls_embed",
    "rerank_logits",
]
