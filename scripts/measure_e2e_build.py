"""End-to-end index-build throughput: chunk(host) → tokenize → embed(TPU).

measure_build_throughput.py times the embed stage alone; this measures the
full build hot path of SURVEY.md §3.1 — hierarchical chunking (which
tokenizes every document with offsets to cut chunk text at token
boundaries), then the production Embedder over the resulting leaves — so
the host-side chunking cost is visible next to device time. The chunking
stage runs twice, with the native tokenizer (hostkit.cpp
tt_encode_offsets) and with TENSOR_TRUTH_TPU_NO_NATIVE=1, to show what
the C path buys on this 1-core host.

Docs are synthetic markdown with a realistic token distribution and
non-ASCII punctuation (em-dashes, accents) so the native path is
exercised on what real corpora look like, not an ASCII idealization.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

N_DOCS = 48
WORDS_PER_DOC = 11_000  # ≈ 43 leaf chunks/doc → ~2k leaves total


def synth_docs(n):
    rng = np.random.default_rng(0)
    vocab = [f"wörd{i:04d}" if i % 7 == 0 else f"word{i:04d}" for i in range(5000)]
    docs = []
    for d in range(n):
        words = rng.choice(vocab, WORDS_PER_DOC)
        # paragraph breaks + em-dashes every so often, like real markdown
        parts = []
        for i, w in enumerate(words):
            parts.append(w)
            if i % 180 == 179:
                parts.append("—\n\n")
        docs.append(" ".join(parts))
    return docs


def chunk_all(docs, tok):
    from tensortruth_tpu.index.chunker import chunk_document

    nodes = []
    for i, text in enumerate(docs):
        nodes.extend(chunk_document(text, tok, doc_id=f"d{i}", metadata={}))
    return nodes


def main():
    from tensortruth_tpu.models.embedder import Embedder
    from tensortruth_tpu.models.xlmr import BGE_M3_CONFIG, init_params
    from tensortruth_tpu.tokenization import load_tokenizer

    import jax.numpy as jnp

    tok = load_tokenizer()
    docs = synth_docs(N_DOCS)

    # -- chunking stage, native vs python --------------------------------
    import tensortruth_tpu.native.hostkit as hk

    chunk_all(docs[:2], tok)  # warm (.so build, table gen)
    t0 = time.perf_counter()
    nodes = chunk_all(docs, tok)
    t_chunk_native = time.perf_counter() - t0
    leaves = [n for n in nodes if not n.child_ids]

    os.environ["TENSOR_TRUTH_TPU_NO_NATIVE"] = "1"
    hk._HOSTKIT = None
    hk._TRIED = False
    t0 = time.perf_counter()
    nodes_py = chunk_all(docs, tok)
    t_chunk_py = time.perf_counter() - t0
    del os.environ["TENSOR_TRUTH_TPU_NO_NATIVE"]
    hk._HOSTKIT = None
    hk._TRIED = False
    assert [n.text for n in nodes] == [n.text for n in nodes_py]

    print(
        f"chunking {N_DOCS} docs -> {len(nodes)} nodes ({len(leaves)} leaves): "
        f"native {t_chunk_native:.2f}s ({len(leaves)/t_chunk_native:.0f} leaves/s) "
        f"vs python {t_chunk_py:.2f}s ({len(leaves)/t_chunk_py:.0f} leaves/s) "
        f"-> {t_chunk_py/t_chunk_native:.1f}x"
    )

    # -- embed stage (production Embedder, full BGE-M3 architecture) -----
    params = init_params(BGE_M3_CONFIG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    emb = Embedder(params, BGE_M3_CONFIG, tok)
    texts = [n.text for n in leaves]
    emb.encode(texts[:256])  # bucket compile warmup
    t0 = time.perf_counter()
    out = emb.encode(texts)
    t_embed = time.perf_counter() - t0
    assert out.shape[0] == len(texts)
    print(
        f"embed {len(texts)} leaves: {t_embed:.2f}s ({len(texts)/t_embed:.0f} chunks/s)"
    )

    e2e = len(leaves) / (t_chunk_native + t_embed)
    e2e_py = len(leaves) / (t_chunk_py + t_embed)
    print(
        f"END-TO-END build: {e2e:.0f} chunks/s (native chunking) vs "
        f"{e2e_py:.0f} chunks/s (python chunking) on backend={jax.default_backend()}"
    )


if __name__ == "__main__":
    main()
