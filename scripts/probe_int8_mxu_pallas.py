"""Probe: does a Pallas (Mosaic) int8 matmul reach the v5e MXU's double rate?

Round 2 measured XLA `dot_general` int8×int8→int32 at the reranker FFN shape
and found NO double-rate path (146 TOPS, identical to bf16 — BASELINE.md
"int8 MXU — dead end on this stack"). That measurement only rules out the
XLA lowering. The v5e MXU natively runs int8 at 394 TOPS (2× the 197 bf16
peak); this script asks whether the Mosaic compiler (Pallas) emits that path
for an int8 `jnp.dot` inside a kernel — the one remaining 2×-class lever on
the cross-encoder rerank, which is 100% of serving batch time.

Shapes: the reranker FFN hot matmul (M=B·S=16384, K=1024, N=4096), timed
device-only with chained iterations inside one jit (no dispatch RTT).

Variants:
  xla_bf16      — jnp.dot bf16 (the 146-TOPS anchor from round 2)
  xla_int8      — jax.lax.dot_general int8→int32 via XLA (rejected r2 path)
  pallas_bf16   — tiled Pallas matmul, bf16 in / f32 out (kernel-efficiency
                  sanity: must land near xla_bf16 or the int8 number is
                  meaningless)
  pallas_int8   — same tiling, int8 in / int32 accumulate

Decision rule: pallas_int8 ≥ ~1.6× pallas_bf16 TOPS → build the quantized
rerank path (weights static-quantized at load, activations quantized in the
preceding kernel); otherwise record the rejection in BASELINE.md next to the
r2 XLA probe.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 16384, 1024, 4096
ITERS = 32
FLOPS = 2 * M * K * N


def _matmul_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)


def pallas_matmul(a, b, *, tile_m, tile_n, acc_dtype, n_outer=False):
    m, k = a.shape
    _, n = b.shape
    if n_outer:
        # Grid (n_tiles, m_tiles): the M index varies fastest, so the B block
        # stays VMEM-resident across a full column sweep (B is loaded from
        # HBM n_tiles times total instead of m_tiles × n_tiles).
        grid = (n // tile_n, m // tile_m)
        a_spec = pl.BlockSpec((tile_m, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((k, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((tile_m, tile_n), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    else:
        grid = (m // tile_m, n // tile_n)
        a_spec = pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((k, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_matmul_kernel, acc_dtype=acc_dtype),
        grid=grid,
        in_specs=[a_spec, b_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=m * k + k * n + m * n * 4,
            transcendentals=0,
        ),
    )(a, b)


def _time_inloop(fn, a, b, iters=ITERS):
    """Chained matmuls inside ONE dispatch; data-dependent so not DCE'd."""

    @jax.jit
    def run(a, b):
        def body(i, carry):
            out = fn(a, b)
            # cheap data dependence: fold one output element into the carry
            return carry + out[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(run(a, b))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(a, b))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    a_f = rng.standard_normal((M, K), dtype=np.float32)
    b_f = rng.standard_normal((K, N), dtype=np.float32)
    a_bf16 = jnp.asarray(a_f, jnp.bfloat16)
    b_bf16 = jnp.asarray(b_f, jnp.bfloat16)
    a_i8 = jnp.asarray(np.clip(a_f * 20, -127, 127).astype(np.int8))
    b_i8 = jnp.asarray(np.clip(b_f * 20, -127, 127).astype(np.int8))

    variants = {
        "xla_bf16": (
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
            a_bf16, b_bf16,
        ),
        "xla_int8": (
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ),
            a_i8, b_i8,
        ),
        "pallas_bf16": (
            partial(pallas_matmul, tile_m=512, tile_n=1024, acc_dtype=jnp.float32),
            a_bf16, b_bf16,
        ),
        "pallas_int8": (
            partial(pallas_matmul, tile_m=512, tile_n=1024, acc_dtype=jnp.int32),
            a_i8, b_i8,
        ),
        # bigger N tile: int8 operands are half-size, room for wider blocks
        "pallas_int8_t2048": (
            partial(pallas_matmul, tile_m=512, tile_n=2048, acc_dtype=jnp.int32),
            a_i8, b_i8,
        ),
        # resident-B sweep order (B loaded n_tiles× total, not m·n times)
        "pallas_bf16_resB": (
            partial(pallas_matmul, tile_m=512, tile_n=1024,
                    acc_dtype=jnp.float32, n_outer=True),
            a_bf16, b_bf16,
        ),
        "pallas_int8_resB": (
            partial(pallas_matmul, tile_m=512, tile_n=1024,
                    acc_dtype=jnp.int32, n_outer=True),
            a_i8, b_i8,
        ),
        "pallas_int8_resB_m1k": (
            partial(pallas_matmul, tile_m=1024, tile_n=1024,
                    acc_dtype=jnp.int32, n_outer=True),
            a_i8, b_i8,
        ),
    }

    print(f"backend={jax.default_backend()} shape=({M},{K})x({K},{N}) iters={ITERS}")
    for name, (fn, a, b) in variants.items():
        try:
            dt = _time_inloop(fn, a, b)
            tops = FLOPS / dt / 1e12
            print(f"{name:20s} {dt*1e3:8.3f} ms/matmul  {tops:7.1f} TOPS")
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            print(f"{name:20s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
