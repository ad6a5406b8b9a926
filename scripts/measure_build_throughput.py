"""Build-time embedding throughput at the 1M-index regime.

Measures chunks/s through Embedder.encode at full BGE-M3 architecture
scale (random-init weights — timing-equivalent to real weights) over
256-token leaf chunks, the build hot loop of SURVEY.md §3.1.
Compares the round-1 configuration (blocking per 64-batch, seq bucket 512)
against the current pipeline (async dispatch, sorted batches, 256 bucket).
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.embedder import Embedder
from tensortruth_tpu.models.xlmr import BGE_M3_CONFIG
from tensortruth_tpu.tokenization import load_tokenizer

N_CHUNKS = 2048
WORDS = 248  # ~256 tokens per leaf chunk


def synth_chunks(n):
    rng = np.random.default_rng(0)
    vocab = [f"w{i:04d}" for i in range(5000)]
    return [
        " ".join(rng.choice(vocab, WORDS)) for _ in range(n)
    ]


def measure(embedder, texts, label):
    t = embedder.encode(texts[:256])  # compile warmup for the buckets
    t0 = time.perf_counter()
    out = embedder.encode(texts)
    dt = time.perf_counter() - t0
    cps = len(texts) / dt
    print(f"{label}: {dt*1e3:.0f} ms for {len(texts)} chunks -> {cps:.0f} chunks/s")
    return cps


def main():
    tok = load_tokenizer()
    texts = synth_chunks(N_CHUNKS)

    r1 = Embedder.random_init(
        BGE_M3_CONFIG, tok, dtype=jnp.bfloat16,
        batch_buckets=(16, 64), seq_buckets=(128, 512),
    )
    cps_r1 = measure(r1, texts, "round-1 config (64-batch, 512 bucket)")
    del r1

    r2 = Embedder.random_init(BGE_M3_CONFIG, tok, dtype=jnp.bfloat16)
    cps_r2 = measure(r2, texts, "current (256-batch, 256 bucket, async)")
    print(f"speedup: {cps_r2 / cps_r1:.2f}x; 1M-chunk build: {1e6/cps_r2/3600:.2f} h")


if __name__ == "__main__":
    main()
