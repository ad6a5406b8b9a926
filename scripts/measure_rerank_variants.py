"""Device-only microbenchmark of cross-encoder forward variants.

The rerank stage dominates e2e query time (BASELINE.md: 566 ms of ~620 ms
per 32-query batch at the bench workload, ~83% MXU). This probes the
remaining headroom with in-jit loops (no dispatch/tunnel overhead):

  v0  current rerank_logits (separate Q/K/V projections, exact gelu)
  v1  fused QKV: one (H, 3H) projection matmul per layer
  v2  v1 + tanh-approximate gelu (headroom probe only — default stays
      exact-erf gelu for torch parity)

Run:  python scripts/measure_rerank_variants.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.xlmr import (
    BGE_RERANKER_V2_M3_CONFIG,
    _dense,
    _layer_norm,
    init_params,
    rerank_logits,
)

PAIRS = 320
SEQ = 256
ITERS = 8


def _attention_fused_qkv(x, mask_bias, lp, cfg, approx_gelu, soft_bf16=False):
    b, s, h = x.shape
    nh, dh = cfg.num_heads, cfg.head_dim
    qkv_w = jnp.concatenate([lp["q_w"], lp["k_w"], lp["v_w"]], axis=1)
    qkv_b = jnp.concatenate([lp["q_b"], lp["k_b"], lp["v_b"]])
    qkv = _dense(x, qkv_w, qkv_b)  # (B, S, 3H)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(y):
        return y.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    acc = jnp.bfloat16 if soft_bf16 else jnp.float32
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=acc)
    scores = scores / np.sqrt(dh) + mask_bias.astype(acc)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum(
        "bnqk,bnkd->bnqd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
    return _dense(ctx, lp["o_w"], lp["o_b"])


def _forward_variant(params, ids, mask, cfg, *, fused_qkv, approx_gelu, soft_bf16=False):
    emb = params["embeddings"]
    dtype = emb["word"].dtype
    pos_ids = (jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id).astype(jnp.int32)
    x = (
        emb["word"][ids] + emb["position"][pos_ids]
        + emb["token_type"][jnp.zeros_like(ids)]
    ).astype(dtype)
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    def body(h, lp):
        attn = _attention_fused_qkv(h, mask_bias, lp, cfg, approx_gelu, soft_bf16)
        h = _layer_norm(h + attn, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
        ffn = _dense(h, lp["fc1_w"], lp["fc1_b"])
        ffn = jax.nn.gelu(ffn.astype(jnp.float32), approximate=approx_gelu).astype(h.dtype)
        ffn = _dense(ffn, lp["fc2_w"], lp["fc2_b"])
        h = _layer_norm(h + ffn, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    cls = x[:, 0, :]
    head = params["classifier"]
    z = _dense(cls, head["dense_w"], head["dense_b"])
    z = jnp.tanh(z.astype(jnp.float32)).astype(z.dtype)
    z = _dense(z, head["out_w"], head["out_b"])
    return z.astype(jnp.float32)[:, 0]


def _inloop_time(fn, params, ids, mask, iters=ITERS):
    """Time `iters` chained forwards inside ONE jit dispatch."""

    @jax.jit
    def run(params, ids, mask):
        def body(i, carry):
            out = fn(params, ids, mask)
            # data dependence so the loop isn't DCE'd / parallelized
            return carry + out.sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    # warm/compile
    np.asarray(run(params, ids, mask))
    t0 = time.perf_counter()
    np.asarray(run(params, ids, mask))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = BGE_RERANKER_V2_M3_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 200, (PAIRS, SEQ)), jnp.int32)
    mask = jnp.ones((PAIRS, SEQ), jnp.int32)

    v0 = partial(rerank_logits, cfg=cfg)
    v1 = partial(_forward_variant, cfg=cfg, fused_qkv=True, approx_gelu=False)
    v2 = partial(_forward_variant, cfg=cfg, fused_qkv=True, approx_gelu=True)
    v3 = partial(
        _forward_variant, cfg=cfg, fused_qkv=True, approx_gelu=False, soft_bf16=True
    )

    # numerical sanity: v1 must match v0 closely (same math, fused weights)
    a = np.asarray(v0(params, ids[:8], mask[:8]))
    b = np.asarray(v1(params, ids[:8], mask[:8]))
    print(f"v1 max |Δlogit| vs v0 (8 pairs): {np.abs(a - b).max():.4f}")
    c = np.asarray(v3(params, ids[:8], mask[:8]))
    print(f"v3 max |Δlogit| vs v0 (8 pairs): {np.abs(a - c).max():.4f}")

    for name, fn in [
        ("v0 current", v0),
        ("v1 fused-qkv", v1),
        ("v2 +approx-gelu", v2),
        ("v3 +bf16-softmax", v3),
    ]:
        t = _inloop_time(fn, params, ids, mask)
        # matmul FLOPs only (embedding lookup is free): 24 layers ×
        # (12·H² linear + 4·S·H attention) per token ≈ 0.63 GFLOP/token.
        h = cfg.hidden_size
        flops_tok = cfg.num_layers * (24 * h * h + 4 * SEQ * h)
        tflops = (PAIRS * SEQ * flops_tok) / t / 1e12
        print(
            f"{name:18s} {t * 1e3:7.1f} ms/{PAIRS} pairs   ~{tflops:5.1f} TFLOPS"
            f" ({tflops / 197 * 100:4.1f}% of v5e peak)"
        )


if __name__ == "__main__":
    main()
