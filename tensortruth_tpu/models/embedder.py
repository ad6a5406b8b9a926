"""BGE-M3-style dense embedder runtime: tokenize → bucket → jit forward.

TPU-native replacement for the reference's sentence-transformers embedding
stack (reference services/model_manager.py:254-260, indexing/builder.py:104-152
with embed_batch_size 128 CUDA / 16 CPU). Key differences:

* one jitted program per (batch-bucket, seq-bucket) pair — shapes are padded
  up to the nearest bucket so XLA compiles a handful of programs once and
  reuses them for the whole corpus (compiles cost ~90s over the axon tunnel);
* bf16 weights/activations, f32 normalized output embeddings;
* batches stream through a single dispatch per bucket — no per-text Python.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.xlmr import XLMRConfig, cls_embed, init_params


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def make_dp_forward(fn, params, mesh, n_batch_args: int = 2):
    """jit ``fn(params, *batch_arrays)`` data-parallel over ALL mesh devices.

    Encoder/reranker forwards are embarrassingly parallel over the batch:
    params replicate, the batch dim of each of the ``n_batch_args`` arrays
    (ids, mask[, type_ids]) shards across every mesh axis (a 2×4 v5e-8 mesh
    runs 8-way DP), XLA inserts zero collectives. Returns
    (forward, replicated_params, batch_multiple).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(mesh.axis_names))
    params = jax.device_put(params, repl)
    fwd = jax.jit(
        fn, in_shardings=(repl, *([batch] * n_batch_args)), out_shardings=batch
    )
    return fwd, params, mesh.devices.size


class Embedder:
    """Holds converted params + compiled forwards; encodes host-side text."""

    def __init__(
        self,
        params: dict,
        cfg: XLMRConfig,
        tokenizer,
        max_length: int = 2048,
        batch_buckets: Sequence[int] = (16, 64, 256),
        seq_buckets: Sequence[int] = (128, 256, 384, 512, 1024, 2048),
        query_prefix: str = "",
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.seq_buckets = tuple(sorted(set(min(b, max_length) for b in seq_buckets)))
        self.query_prefix = query_prefix
        self.mesh = mesh
        if mesh is not None:
            self._fwd, self.params, self._batch_multiple = make_dp_forward(
                partial(cls_embed, cfg=cfg), params, mesh
            )
        else:
            self._fwd = jax.jit(partial(cls_embed, cfg=cfg))
            self._batch_multiple = 1

    @classmethod
    def random_init(
        cls, cfg: XLMRConfig, tokenizer, seed: int = 0, dtype=jnp.bfloat16, **kw
    ) -> "Embedder":
        """Random weights at full architecture scale (offline/bench use)."""
        params = init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
        return cls(params, cfg, tokenizer, **kw)

    @property
    def dim(self) -> int:
        return self.cfg.hidden_size

    @property
    def gelu_flavor(self) -> str:
        """"tanh" or "exact" — the GELU variant this encoder computes.

        Recorded in index metadata at build time so an index embedded with
        one flavor queried with the other (~1e-3 activation delta; TPU
        defaults to tanh, CPU/GPU to exact) is detectable at load.
        """
        from tensortruth_tpu.models.xlmr import _use_approx_gelu

        return "tanh" if _use_approx_gelu(self.cfg) else "exact"

    def param_bytes(self) -> int:
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(self.params))

    def encode(
        self, texts: Sequence[str], is_query: bool = False, batch_size: int | None = None
    ) -> np.ndarray:
        """Embed texts → (len(texts), H) f32 L2-normalized numpy array.

        Throughput discipline (build-time hot loop, SURVEY.md §3.1):
        tokenize everything once, sort by token length so each device batch
        pads to the tightest (batch, seq) bucket, dispatch ALL batches
        asynchronously (JAX dispatch returns before the device finishes, so
        host-side padding of batch i+1 overlaps device compute of batch i
        and the per-dispatch tunnel RTT amortizes), then convert results
        after the last dispatch.
        """
        if not texts:
            return np.zeros((0, self.cfg.hidden_size), dtype=np.float32)
        if is_query and self.query_prefix:
            texts = [self.query_prefix + t for t in texts]

        max_batch = min(batch_size or self.batch_buckets[-1], self.batch_buckets[-1])
        # Slabs bound host memory AND overlap: tokenizing slab s+1 runs while
        # the device still computes slab s's async dispatches.
        slab = max(8 * max_batch, 2048)

        out = np.empty((len(texts), self.cfg.hidden_size), dtype=np.float32)
        prev = []  # previous slab's (global selection, device array, n_real)
        for slab_start in range(0, len(texts), slab):
            chunk = list(texts[slab_start : slab_start + slab])
            ids, mask = self.tokenizer.encode_batch(chunk, self.max_length)
            lengths = mask.sum(axis=1)
            order = np.argsort(-lengths, kind="stable")  # longest first
            cur = []
            for start in range(0, len(chunk), max_batch):
                sel = order[start : start + max_batch]
                seq = _bucket(int(lengths[sel].max()), self.seq_buckets)
                bsz = _bucket(len(sel), self.batch_buckets)
                bsz = -(-bsz // self._batch_multiple) * self._batch_multiple  # DP
                ids_p = np.full((bsz, seq), self.tokenizer.pad_id, dtype=np.int32)
                mask_p = np.zeros((bsz, seq), dtype=np.int32)
                ids_p[: len(sel)] = ids[sel, :seq]
                mask_p[: len(sel)] = mask[sel, :seq]
                emb = self._fwd(self.params, jnp.asarray(ids_p), jnp.asarray(mask_p))
                cur.append((slab_start + sel, emb, len(sel)))
            # Drain one slab BEHIND the dispatch front: the whole current
            # slab is already queued on the device, so converting the
            # previous slab's (finished or finishing) outputs here keeps
            # the device fed while bounding held outputs to ~2 slabs —
            # the all-pending variant held every output of a 1M+-chunk
            # build on a 16 GB chip.
            for sel, emb, n in prev:
                out[sel] = np.asarray(emb[:n], dtype=np.float32)
            prev = cur
        for sel, emb, n in prev:
            out[sel] = np.asarray(emb[:n], dtype=np.float32)
        return out

    def encode_one(self, text: str, is_query: bool = True) -> np.ndarray:
        return self.encode([text], is_query=is_query)[0]
