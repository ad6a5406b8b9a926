"""Probe: does a 512-row batch bucket lift build-time embed throughput?

The round-2 study settled on batch 256 / seq 256 (503 chunks/s, ~47% MFU,
BASELINE.md "Build-time embedding throughput"). The rerank forward reaches
~64% MFU at comparable row counts, so the remaining gap is either host-side
(tokenization overlap, dispatch RTT) or batch-shape headroom. This A/Bs
batch buckets 256 vs 512 vs 1024 at the production seq bucket (256) over
the same sorted-async encode path; a win moves the Embedder default, a
loss gets recorded next to the other measured rejections.
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.embedder import Embedder
from tensortruth_tpu.models.xlmr import BGE_M3_CONFIG
from tensortruth_tpu.tokenization import load_tokenizer

N_CHUNKS = 4096
WORDS = 248  # ~256 tokens per leaf chunk


def synth_chunks(n):
    rng = np.random.default_rng(0)
    vocab = [f"w{i:04d}" for i in range(5000)]
    return [" ".join(rng.choice(vocab, WORDS)) for _ in range(n)]


def measure(embedder, texts, label):
    embedder.encode(texts[:1024])  # warm every bucket the run can hit
    t0 = time.perf_counter()
    embedder.encode(texts)
    dt = time.perf_counter() - t0
    cps = len(texts) / dt
    print(f"{label}: {dt*1e3:.0f} ms for {len(texts)} chunks -> {cps:.0f} chunks/s")
    return cps


def main():
    tok = load_tokenizer()
    texts = synth_chunks(N_CHUNKS)
    for batches in ((64, 256), (64, 256, 512), (64, 256, 1024)):
        e = Embedder.random_init(
            BGE_M3_CONFIG, tok, dtype=jnp.bfloat16, batch_buckets=batches,
        )
        measure(e, texts, f"batch_buckets={batches}")
        del e


if __name__ == "__main__":
    main()
