"""Measure the realistic rerank-pair token-length distribution.

Chunks real technical documentation (the reference repo's own markdown docs)
with the production hierarchical chunker (sizes [2048, 512, 256], overlap 64
— reference builder.py:305-307) and reports the LEAF token-length histogram
plus the derived (query + sep + chunk) pair lengths that bench.py's rerank
workload should model. The 256-token chunk *target* is an upper bound; real
leaves are often far shorter (section tails, short paragraphs), which is
exactly what pair-length-bucketed rerank exploits.

Run: JAX_PLATFORMS=cpu python scripts/measure_pair_lengths.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tensortruth_tpu.index.chunker import chunk_document
from tensortruth_tpu.tokenization import load_tokenizer

QUERY_TOKENS = 16  # typical short technical query
SEP_TOKENS = 3     # [CLS] q [SEP] d [SEP]


def main():
    tok = load_tokenizer()
    docs = sorted(Path("/root/reference").glob("**/*.md"))
    lengths = []
    for p in docs:
        try:
            text = p.read_text(encoding="utf-8")
        except Exception:
            continue
        if len(text) < 200:
            continue
        nodes = chunk_document(text, tok, doc_id=p.name)
        for n in nodes:
            if not n.child_ids:  # leaf
                lengths.append(len(tok.encode(n.text)))
    lengths = np.asarray(lengths)
    pair = lengths + QUERY_TOKENS + SEP_TOKENS
    print(f"docs={len(docs)} leaves={len(lengths)}")
    print(f"leaf tokens: mean={lengths.mean():.0f} median={np.median(lengths):.0f}")
    qs = [5, 25, 50, 75, 90, 99]
    print("leaf quantiles:", {q: int(np.percentile(lengths, q)) for q in qs})
    print("pair quantiles:", {q: int(np.percentile(pair, q)) for q in qs})
    for b in [64, 128, 192, 256, 320, 512]:
        frac = (pair <= b).mean()
        print(f"pairs <= {b}: {frac * 100:.1f}%")
    buckets = [64, 128, 192, 256, 320, 512, 1024, 2048]
    hist = {}
    prev = 0
    for b in buckets:
        hist[b] = round(float(((pair > prev) & (pair <= b)).mean()), 4)
        prev = b
    print("pair bucket shares:", hist)


if __name__ == "__main__":
    main()
