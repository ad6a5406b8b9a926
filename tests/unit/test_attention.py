"""Pallas blocked attention vs naive reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensortruth_tpu.ops.attention import attention_reference, blocked_attention


@pytest.mark.parametrize("b,nh,s,dh", [(2, 4, 256, 32), (1, 2, 512, 64)])
def test_blocked_matches_reference(rng, b, nh, s, dh):
    q = jnp.asarray(rng.standard_normal((b, nh, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nh, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nh, s, dh)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[:, s // 2 :] = 0  # half padding
    mask = jnp.asarray(mask)

    out = blocked_attention(q, k, v, mask, interpret=True)
    ref = attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_encoder_flash_path_matches_naive(rng):
    """Full encoder with flash on/off must agree (tiny config, S=256)."""
    from tensortruth_tpu.models.xlmr import XLMRConfig, cls_embed, init_params

    base = dict(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=2,
        intermediate_size=128, max_position=300,
    )
    cfg_naive = XLMRConfig(**base, flash_attention=False)
    cfg_flash = XLMRConfig(**base, flash_attention=True)
    params = init_params(cfg_naive, jax.random.PRNGKey(0), dtype=jnp.float32)

    ids = jnp.asarray(rng.integers(5, 128, (2, 256)), jnp.int32)
    mask = np.ones((2, 256), np.int32)
    mask[0, 100:] = 0
    mask = jnp.asarray(mask)

    out_naive = cls_embed(params, ids, mask, cfg_naive)
    out_flash = cls_embed(params, ids, mask, cfg_flash)
    np.testing.assert_allclose(
        np.asarray(out_naive), np.asarray(out_flash), atol=1e-4, rtol=1e-4
    )
