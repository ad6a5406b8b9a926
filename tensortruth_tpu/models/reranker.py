"""Cross-encoder reranker runtime (BGE-reranker-v2-m3 architecture).

TPU-native replacement for the reference's LlamaIndex
``SentenceTransformerRerank`` (reference model_manager.py:333-337,
rag_engine.py:711-726): each (query, doc) pair is scored by one forward pass
through the XLM-R cross-encoder; sigmoid maps logits into [0, 1] — the scale
the reference's confidence cutoffs (0.35 soft / 0.05 hard,
config_schema.py:99-100) are defined on.

Pairs are shaped into (batch-bucket, seq-bucket) padded batches so only a few
programs ever compile; variable-length pairs bucket by the longest pair in
the batch (SURVEY.md §7 hard part (f)).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.xlmr import XLMRConfig, init_params, rerank_logits


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


class Reranker:
    def __init__(
        self,
        params: dict,
        cfg: XLMRConfig,
        tokenizer,
        max_length: int = 2048,
        batch_buckets: Sequence[int] = (16, 32, 64, 128),
        seq_buckets: Sequence[int] = (64, 128, 192, 256, 320, 512, 1024, 2048),
        mesh=None,
    ):
        assert cfg.num_labels == 1, "reranker config needs num_labels=1"
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.seq_buckets = tuple(sorted(set(min(b, max_length) for b in seq_buckets)))
        self.mesh = mesh
        # BERT-family cross-encoders (single-SEP pairs, type_vocab_size 2)
        # were trained with segment ids on the doc side; XLM-R rerankers have
        # a single token type and never pass them. Static per-model choice —
        # each compiles its own fixed-arity program.
        self._needs_type_ids = (
            cfg.position_style == "bert" and cfg.type_vocab_size > 1
        )
        n_args = 3 if self._needs_type_ids else 2
        if self._needs_type_ids:
            fn = lambda p, i, m, t: rerank_logits(p, i, m, cfg=cfg, type_ids=t)  # noqa: E731
        else:
            fn = partial(rerank_logits, cfg=cfg)
        if mesh is not None:
            # DP rerank over every mesh device: the cross-encoder forward is
            # the pipeline bottleneck (~91% of e2e time single-chip) and is
            # embarrassingly parallel over pairs — v5e-8 scales it ~8×.
            from tensortruth_tpu.models.embedder import make_dp_forward

            self._fwd, self.params, self._batch_multiple = make_dp_forward(
                fn, params, mesh, n_batch_args=n_args
            )
        else:
            self._fwd = jax.jit(fn)
            self._batch_multiple = 1

    @classmethod
    def random_init(
        cls, cfg: XLMRConfig, tokenizer, seed: int = 0, dtype=jnp.bfloat16, **kw
    ) -> "Reranker":
        params = init_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
        return cls(params, cfg, tokenizer, **kw)

    def param_bytes(self) -> int:
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(self.params))

    def score(self, query: str, docs: Sequence[str]) -> np.ndarray:
        """Sigmoid relevance scores in [0, 1], shape (len(docs),) f32."""
        return self.score_pairs([(query, d) for d in docs])

    def rerank(
        self, query: str, docs: Sequence[str], top_n: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Return (order, scores): indices of the top_n docs by score, desc."""
        scores = self.score(query, docs)
        order = np.argsort(-scores, kind="stable")[:top_n]
        return order, scores

    def score_pairs(self, pairs: Sequence[tuple[str, str]]) -> np.ndarray:
        """Cross-query pair scoring: [(query, doc), ...] → (N,) sigmoid scores.

        Server-side micro-batching shapes pairs from MANY concurrent queries
        into the same bucketed device batches (services/batcher.py). Pairs
        are tokenized once and processed longest-first so each device batch
        lands in the tightest (batch, seq) bucket — mixed-length workloads
        waste no MXU cycles on padding.

        Throughput discipline (same as Embedder.encode): every device batch
        is dispatched asynchronously and converted after the LAST dispatch,
        so host-side padding of batch i+1 and the per-dispatch tunnel RTT
        overlap device compute of batch i instead of serializing after it.
        """
        return self.score_pairs_async(pairs)()

    def score_pairs_async(self, pairs: Sequence[tuple[str, str]], feeder=None):
        """Two-phase scoring: dispatch every device batch NOW, return a
        ``finish() -> (N,) np.float32`` that performs the (blocking)
        device→host conversion.

        The serving batcher double-buffers with this: batch B's finish()
        runs only after batch B+1's work is dispatched, so the device never
        idles across batch boundaries and the conversion RTT of B overlaps
        the compute of B+1 (services/batcher.py two-phase protocol).

        ``feeder`` (services/feeder.py HostFeeder) shards the host tokenize
        stage across a worker pool — the 8-chip DP deployment's host term
        (r4 verdict item 5); None keeps the single-threaded path.
        """
        if not pairs:
            return lambda: np.zeros((0,), dtype=np.float32)
        if feeder is not None:
            ids, mask = feeder.tokenize_pairs(self.tokenizer, pairs, self.max_length)
        else:
            ids, mask = self.tokenizer.encode_batch(
                [q for q, _ in pairs], self.max_length, pair=[d for _, d in pairs]
            )
        return self.score_tokenized_async(ids, mask)

    def score_tokenized_async(self, ids: np.ndarray, mask: np.ndarray):
        """Bucket/pad + device dispatch over pre-tokenized pair rows —
        the stage after the (possibly worker-pooled) host tokenize."""
        n_pairs = ids.shape[0]
        if n_pairs == 0:
            return lambda: np.zeros((0,), dtype=np.float32)
        lengths = mask.sum(axis=1)
        order = np.argsort(-lengths, kind="stable")  # longest first

        # Partition the sorted order at seq-bucket boundaries BEFORE batch
        # splitting: a device batch never mixes seq buckets, so a 147-token
        # pair is never padded to a 320-token row just because it shared a
        # batch with long pairs. Measured on the real leaf-length
        # distribution (scripts/measure_pair_lengths.py: ~65% of pairs at
        # ~275 tok, ~30% at ~147) this removes all mixing waste for ~2 extra
        # dispatches, whose tunnel RTT the async dispatch loop already hides.
        #
        # Each run then splits GREEDILY into exact batch-bucket sizes
        # (208 → 128+64+16) instead of fixed max-batch slices: the old
        # scheme padded a trailing 80-pair slice to a 128-row dispatch —
        # 37% wasted MXU rows on the dominant long-pair run. Only a tail
        # smaller than the smallest bucket ever pads now.
        #
        # Long sequences additionally cap the batch at 64 rows: measured on
        # v5e (BASELINE.md sweep), a 128×320 dispatch costs 2.00 ms/pair vs
        # 1.86 at 64×320 (larger activation transients), while at S≤256
        # bigger batches stay equal-or-better — A/B on the realistic mix:
        # 420.1 → 401.5 ms/320 pairs with the cap.
        groups: list[np.ndarray] = []

        def split_run(run: np.ndarray, seq_bucket: int) -> None:
            cap = 64 if seq_bucket >= 320 else self.batch_buckets[-1]
            usable = [b for b in self.batch_buckets if b <= cap] or list(
                self.batch_buckets[:1]
            )
            i = 0
            while i < len(run):
                rem = len(run) - i
                take = next((b for b in reversed(usable) if b <= rem), rem)
                groups.append(run[i : i + take])
                i += take

        run_start = 0
        run_bucket = _bucket(int(lengths[order[0]]), self.seq_buckets)
        for i in range(1, len(order) + 1):
            b_i = (
                _bucket(int(lengths[order[i]]), self.seq_buckets)
                if i < len(order)
                else None
            )
            if b_i != run_bucket:
                split_run(order[run_start:i], run_bucket)
                run_start, run_bucket = i, b_i

        pending = []  # (selection, device probs, n_real)
        for sel in groups:
            real_len = int(lengths[sel].max())
            seq = _bucket(real_len, self.seq_buckets)
            bsz = _bucket(len(sel), self.batch_buckets)
            bsz = -(-bsz // self._batch_multiple) * self._batch_multiple  # DP shardable
            ids_p = np.full((bsz, seq), self.tokenizer.pad_id, dtype=np.int32)
            mask_p = np.zeros((bsz, seq), dtype=np.int32)
            ids_p[: len(sel)] = ids[sel, :seq]
            mask_p[: len(sel)] = mask[sel, :seq]
            if self._needs_type_ids:
                # BERT segment ids from the single-SEP layout: type 1 strictly
                # after the first [SEP] (the doc segment + trailing [SEP]),
                # type 0 elsewhere incl. padding — matches HF encode_plus.
                first_sep = (ids_p == self.tokenizer.sep_id).argmax(axis=1)
                type_p = (
                    (np.arange(seq)[None, :] > first_sep[:, None]) & (mask_p > 0)
                ).astype(np.int32)
                logits = self._fwd(
                    self.params, jnp.asarray(ids_p), jnp.asarray(mask_p),
                    jnp.asarray(type_p),
                )
            else:
                logits = self._fwd(
                    self.params, jnp.asarray(ids_p), jnp.asarray(mask_p)
                )
            pending.append((sel, jax.nn.sigmoid(logits), len(sel)))

        # ONE device→host transfer for all buckets: per-array np.asarray
        # costs a full tunnel RTT each (~30 ms on the remote axon platform —
        # measured 4 buckets ≈ +120 ms per serving batch); a device-side
        # concat makes it one dispatch + one transfer. Dispatch the concat
        # NOW (async) so by finish() time it is usually already computed.
        fused = (
            pending[0][1]
            if len(pending) == 1
            else jnp.concatenate([p for _, p, _ in pending])
        )

        def finish() -> np.ndarray:
            out = np.empty((n_pairs,), dtype=np.float32)
            host = np.asarray(fused, dtype=np.float32)
            off = 0
            for sel, probs, n in pending:
                out[sel] = host[off : off + n]
                off += probs.shape[0]
            return out

        return finish
