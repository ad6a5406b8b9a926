"""Real-device smoke tests.

The main pytest conftest pins the CPU backend before JAX initializes, so
these run STANDALONE on a TPU host:

    python tests/tpu/test_tpu_smoke.py

The CPU suite covers logic via interpret mode + virtual meshes; these verify
the Mosaic-compiled kernels on hardware.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.requires_tpu


@pytest.fixture(scope="module")
def tpu():
    import importlib
    import os

    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    importlib.reload(jax.config) if False else None
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    return jax


def test_fused_topk_on_device(tpu):
    import jax.numpy as jnp

    from tensortruth_tpu.ops.topk import exact_topk, fused_topk

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((100_000, 256)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[:8]
    ev, ei = exact_topk(jnp.asarray(q, jnp.bfloat16), jnp.asarray(emb, jnp.bfloat16), 10)
    fv, fi = fused_topk(jnp.asarray(q, jnp.bfloat16), jnp.asarray(emb, jnp.bfloat16), 10)
    overlap = np.mean([
        len(set(np.asarray(ei)[i]) & set(np.asarray(fi)[i])) / 10 for i in range(8)
    ])
    assert overlap >= 0.99
    assert (np.asarray(fi)[:, 0] == np.arange(8)).all()  # self-retrieval


def test_blocked_attention_on_device(tpu):
    import jax
    import jax.numpy as jnp

    from tensortruth_tpu.ops.attention import attention_reference, blocked_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 4, 512, 64), jnp.bfloat16)
    mask = jnp.ones((2, 512), jnp.int32)
    out = blocked_attention(q, q, q, mask)
    ref = attention_reference(q, q, q, mask)
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert diff < 0.05


def test_ivf_probe_kernel_on_device(tpu):
    from tensortruth_tpu.ops.ivf import build_ivf, ivf_search

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((50_000, 128)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = build_ivf(emb, n_clusters=32, sample_size=10_000, kmeans_iters=5)
    vals, rows = ivf_search(index, emb[:8], k=1, nprobe=4)
    assert (rows[:, 0] == np.arange(8)).mean() >= 0.9


def test_fused_topk_int8_dynamic_valid_on_device(tpu):
    """int8 quantized kernel WITH a traced n_valid (the mesh-shard path,
    r3): Mosaic-compiled on hardware, must match exact over the valid
    prefix."""
    import jax.numpy as jnp

    from tensortruth_tpu.ops.topk import exact_topk, fused_topk_int8, quantize_corpus

    rng = np.random.default_rng(1)
    n, n_valid, d, k = 50_000, 37_123, 256, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_q, scales = quantize_corpus(emb)
    q = emb[:8]

    fv, fi = fused_topk_int8(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(emb_q), jnp.asarray(scales),
        k, n_valid=jnp.int32(n_valid),
    )
    ev, ei = exact_topk(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(emb[:n_valid], jnp.bfloat16), k
    )
    fi, ei = np.asarray(fi), np.asarray(ei)
    assert fi.max() < n_valid  # masked tail never leaks
    overlap = np.mean([len(set(fi[i]) & set(ei[i])) / k for i in range(8)])
    assert overlap >= 0.9  # int8 + bucketed accumulator tolerance
    assert (fi[:, 0] == np.arange(8)).all()


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    assert jax.default_backend() == "tpu", jax.default_backend()
    for fn in (
        test_fused_topk_on_device,
        test_blocked_attention_on_device,
        test_ivf_probe_kernel_on_device,
        test_fused_topk_int8_dynamic_valid_on_device,
    ):
        fn(jax)
        print(f"{fn.__name__}: OK", flush=True)
    print("TPU SMOKE: ALL OK")
