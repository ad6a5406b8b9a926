"""Pallas blocked attention for the encoder (bidirectional, padding mask).

SURVEY.md §0/§7: the reference optionally uses CUDA flash-attn inside the
torch encoder (reference builder.py:127-134, model_manager.py:233-242); the
TPU-native equivalent is this kernel. It matters for the *build-time*
embedding path where chunks run up to 2048 tokens: naive attention
materializes (B, NH, S, S) f32 score tensors in HBM (S=2048 → 256 MB per
batch-of-16 per layer), while this kernel streams q row-blocks against the
full K/V resident in VMEM — for encoder sequence lengths (≤ 8k) K/V fit
on-chip per (batch, head), so the exact softmax needs no online rescaling
and the (S, S) matrix never exists outside VMEM tiles.

Grid: (B, NH, S/BLK_Q). Per step: scores = q_blk @ K^T on the MXU (f32),
additive padding bias, softmax, @ V. All f32 math on the (BLK_Q, S) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLK_Q = 256


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (BLK_Q, DH)
    k = k_ref[0, 0]  # (S, DH)
    v = v_ref[0, 0]  # (S, DH)
    bias = bias_ref[0]  # (1, S) f32 additive padding bias

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias  # broadcast (1, S) over rows
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blocked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact padding-masked attention without HBM score tensors.

    q/k/v: (B, NH, S, DH); mask: (B, S) 1=real/0=pad. Returns (B, NH, S, DH)
    in q.dtype. S must be a multiple of BLK_Q (callers pad via seq buckets).
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, nh, s, dh = q.shape
    assert s % BLK_Q == 0, f"seq {s} must be a multiple of {BLK_Q}"
    scale = 1.0 / np.sqrt(dh)
    bias = jnp.where(mask > 0, 0.0, -1e9).astype(jnp.float32)[:, None, :]  # (B,1,S)

    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b, nh, s // BLK_Q),
        in_specs=[
            pl.BlockSpec((1, 1, BLK_Q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BLK_Q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, s, dh), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def attention_reference(q, k, v, mask):
    """Naive XLA path (parity target + short-sequence default)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
    s = jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale + bias, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bnkd->bnqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)
