"""XLM-RoBERTa encoder in pure functional JAX — the shared backbone of the
BGE-M3 embedder and the BGE-reranker-v2-m3 cross-encoder.

The reference runs these models through torch/sentence-transformers
(reference services/model_manager.py:24-25, 254-260, 333-337); here the same
architecture is a TPU-first program:

* **Stacked layer parameters + ``lax.scan``** over the 24 layers — one traced
  layer body instead of 24 unrolled copies, which cuts XLA compile time ~an
  order of magnitude (compiles cost ~90s over the axon tunnel) and produces
  identical HLO per step.
* bf16 activations/weights with f32 LayerNorm & softmax for stability; matmul
  accumulation forced to f32 via ``preferred_element_type``.
* Padding-mask attention (encoder is bidirectional — no causal mask).
* No dropout anywhere: this engine only ever runs inference.

Architecture facts (must match HF ``XLMRobertaModel`` for weight
compatibility): post-LN BERT blocks, exact (erf) GELU, learned positions with
``padding_idx=1`` offset — position ids are ``cumsum(mask)*mask + 1``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class XLMRConfig:
    vocab_size: int = 250002
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position: int = 8194  # includes the +2 padding_idx offset
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    # classification head (reranker only)
    num_labels: int = 0
    # Pallas blocked attention (ops/attention.py): None = auto (TPU and
    # seq ≥ 512), True/False forces. Matters for 2048-token build chunks.
    flash_attention: bool | None = None
    # GELU flavor: None = auto (tanh approximation on TPU — measured 7-13%
    # of the whole cross-encoder forward goes to exact-erf on the VPU,
    # scripts/measure_rerank_variants.py — exact erf elsewhere, which is
    # what torch-parity tests compare against). The tanh form's error
    # (~1e-3 absolute, peak near |x|≈2) is far below the bf16 activation
    # rounding the TPU path already carries. True forces approx, False
    # forces exact.
    approx_gelu: bool | None = None
    # Position-id convention: "xlmr" = cumsum(mask)+pad_id (RoBERTa family),
    # "bert" = plain arange (BERT/MiniLM rerankers like
    # cross-encoder/ms-marco-MiniLM).
    position_style: str = "xlmr"
    # Sentence-embedding pooling: "cls" (BGE family) or "mean" (masked mean
    # over real tokens — the sentence-transformers default for BERT-family
    # embedders like all-MiniLM; read from 1_Pooling/config.json at load).
    pooling: str = "cls"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


# BAAI/bge-m3: XLM-RoBERTa-large encoder, dense vector = normalized CLS state.
BGE_M3_CONFIG = XLMRConfig()
# BAAI/bge-reranker-v2-m3: same backbone + 1-logit classification head.
BGE_RERANKER_V2_M3_CONFIG = XLMRConfig(num_labels=1)


def init_params(
    cfg: XLMRConfig, key: jax.Array, dtype=jnp.bfloat16
) -> dict:
    """Random-init parameter pytree with HF-compatible structure (stacked layers)."""
    k = jax.random.split(key, 8)
    h, i_, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    std = 0.02

    def norm(key, shape):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    params = {
        "embeddings": {
            "word": norm(k[0], (cfg.vocab_size, h)),
            "position": norm(k[1], (cfg.max_position, h)),
            "token_type": norm(k[2], (cfg.type_vocab_size, h)),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": {
            "q_w": norm(k[3], (L, h, h)),
            "q_b": jnp.zeros((L, h), dtype),
            "k_w": norm(k[4], (L, h, h)),
            "k_b": jnp.zeros((L, h), dtype),
            "v_w": norm(k[5], (L, h, h)),
            "v_b": jnp.zeros((L, h), dtype),
            "o_w": norm(k[6], (L, h, h)),
            "o_b": jnp.zeros((L, h), dtype),
            "ln1_scale": jnp.ones((L, h), jnp.float32),
            "ln1_bias": jnp.zeros((L, h), jnp.float32),
            "fc1_w": norm(k[7], (L, h, i_)),
            "fc1_b": jnp.zeros((L, i_), dtype),
            "fc2_w": norm(k[3], (L, i_, h)),
            "fc2_b": jnp.zeros((L, h), dtype),
            "ln2_scale": jnp.ones((L, h), jnp.float32),
            "ln2_bias": jnp.zeros((L, h), jnp.float32),
        },
    }
    if cfg.num_labels:
        params["classifier"] = {
            "dense_w": norm(k[0], (h, h)),
            "dense_b": jnp.zeros((h,), dtype),
            "out_w": norm(k[1], (h, cfg.num_labels)),
            "out_b": jnp.zeros((cfg.num_labels,), dtype),
        }
    return params


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """f32 LayerNorm over the last axis, result cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dense(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _use_flash(cfg: XLMRConfig, s: int) -> bool:
    if cfg.flash_attention is not None:
        return cfg.flash_attention and s % 256 == 0
    return jax.default_backend() == "tpu" and s >= 512 and s % 256 == 0


def _use_approx_gelu(cfg: XLMRConfig) -> bool:
    if cfg.approx_gelu is not None:
        return cfg.approx_gelu
    return jax.default_backend() == "tpu"


def _attention(
    x: jax.Array, mask: jax.Array, mask_bias: jax.Array, lp: dict, cfg: XLMRConfig
) -> jax.Array:
    """Bidirectional multi-head self-attention with padding mask.

    x: (B, S, H); mask: (B, S) int; mask_bias: (B, 1, 1, S) additive f32.
    Long sequences route to the Pallas blocked kernel (ops/attention.py)
    so the (S, S) score tensor never reaches HBM.
    """
    b, s, h = x.shape
    nh, dh = cfg.num_heads, cfg.head_dim

    def split(y):
        return y.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)  # (B, NH, S, DH)

    q = split(_dense(x, lp["q_w"], lp["q_b"]))
    k = split(_dense(x, lp["k_w"], lp["k_b"]))
    v = split(_dense(x, lp["v_w"], lp["v_b"]))

    if _use_flash(cfg, s):
        from tensortruth_tpu.ops.attention import blocked_attention

        ctx = blocked_attention(q, k, v, mask)
    else:
        scores = jnp.einsum(
            "bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores / np.sqrt(dh) + mask_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bnqk,bnkd->bnqd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, h)
    return _dense(ctx, lp["o_w"], lp["o_b"])


def _layer(
    x: jax.Array, lp: dict, mask: jax.Array, mask_bias: jax.Array, cfg: XLMRConfig
) -> jax.Array:
    """One post-LN transformer block (attention → add&LN → FFN → add&LN)."""
    attn = _attention(x, mask, mask_bias, lp, cfg)
    x = _layer_norm(x + attn, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
    ffn = _dense(x, lp["fc1_w"], lp["fc1_b"])
    ffn = jax.nn.gelu(
        ffn.astype(jnp.float32), approximate=_use_approx_gelu(cfg)
    ).astype(x.dtype)
    ffn = _dense(ffn, lp["fc2_w"], lp["fc2_b"])
    x = _layer_norm(x + ffn, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
    return x


def encoder_forward(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg: XLMRConfig,
    type_ids: jax.Array | None = None,
) -> jax.Array:
    """Full encoder: (B, S) int ids + mask → (B, S, H) last hidden states.

    ``type_ids`` carries BERT segment ids for cross-encoder pairs
    (type 1 on the doc segment — trained BERT rerankers attend to it);
    XLM-R has ``type_vocab_size=1`` and always uses zeros.
    """
    emb = params["embeddings"]
    dtype = emb["word"].dtype

    if cfg.position_style == "bert":
        pos_ids = jnp.broadcast_to(
            jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :], ids.shape
        )
    else:
        # XLM-R position ids: padding_idx=1, real tokens get 2, 3, ...
        pos_ids = (jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id).astype(jnp.int32)
    if type_ids is None:
        type_ids = jnp.zeros_like(ids)
    x = (
        emb["word"][ids]
        + emb["position"][pos_ids]
        + emb["token_type"][type_ids]
    ).astype(dtype)
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)

    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    def body(h, lp):
        return _layer(h, lp, mask, mask_bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def cls_embed(
    params: dict, ids: jax.Array, mask: jax.Array, cfg: XLMRConfig
) -> jax.Array:
    """Dense sentence embedding, f32 (B, H), L2-normalized.

    ``cfg.pooling`` selects CLS pooling (BGE family) or masked mean pooling
    (sentence-transformers BERT-family embedders — the 1_Pooling config of
    e.g. all-MiniLM models; reference loads these through
    sentence-transformers, reference model_manager.py:254-260).
    """
    hidden = encoder_forward(params, ids, mask, cfg)
    if cfg.pooling == "mean":
        m = mask.astype(jnp.float32)[:, :, None]
        pooled = (hidden.astype(jnp.float32) * m).sum(axis=1) / jnp.maximum(
            m.sum(axis=1), 1e-9
        )
    else:
        pooled = hidden[:, 0, :].astype(jnp.float32)
    return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-12)


def rerank_logits(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg: XLMRConfig,
    type_ids: jax.Array | None = None,
) -> jax.Array:
    """Cross-encoder relevance logit per (query, doc) pair: f32 (B,).

    Head math is identical across both supported families —
    dense → tanh → out_proj over the CLS state — because HF's
    RobertaClassificationHead and BERT's pooler(+tanh)→classifier are the
    same computation; models/convert.py maps either weight layout onto the
    one ``classifier`` pytree. Callers apply sigmoid to map into [0, 1]
    (the scale the reference's confidence cutoffs 0.35/0.05 are defined
    on, config_schema.py:99-100).
    """
    hidden = encoder_forward(params, ids, mask, cfg, type_ids=type_ids)
    cls = hidden[:, 0, :]
    head = params["classifier"]
    z = _dense(cls, head["dense_w"], head["dense_b"])
    z = jnp.tanh(z.astype(jnp.float32)).astype(z.dtype)
    z = _dense(z, head["out_w"], head["out_b"])
    return z.astype(jnp.float32)[:, 0]


def cast_params(params: dict, dtype) -> dict:
    """Cast float params to dtype, keeping LayerNorm params in f32."""

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.startswith("ln"):  # ln_scale/ln_bias/ln1_*/ln2_* stay f32
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)
