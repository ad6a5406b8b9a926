"""HFTokenizer wrapper against a real (tiny, locally-built) tokenizer.json —
covers the production tokenization path without network/HF cache."""

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def tok_file(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.WordPiece(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.WordPieceTrainer(
        vocab_size=200,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    corpus = ["the quick brown fox jumps over the lazy dog"] * 20
    tok.train_from_iterator(corpus, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


def test_hf_tokenizer_offsets_and_batch(tok_file):
    from tensortruth_tpu.tokenization import HFTokenizer, load_tokenizer

    t = load_tokenizer(tok_file)
    assert isinstance(t, HFTokenizer)

    text = "the quick brown fox"
    ids, offsets = t.encode_with_offsets(text)
    assert len(ids) == len(offsets) > 0
    # offsets index back into the text
    for (s, e), _ in zip(offsets, ids):
        assert text[s:e].strip()

    ids_b, mask_b = t.encode_batch(["the fox", "the quick brown fox jumps"], 16)
    assert ids_b.shape == mask_b.shape == (2, 16)
    assert ids_b[0, 0] == t.cls_id
    n0, n1 = int(mask_b[0].sum()), int(mask_b[1].sum())
    assert n1 > n0  # longer text → more real tokens
    assert (ids_b[0, n0:] == t.pad_id).all()

    # pair encoding (reranker input shape)
    ids_p, mask_p = t.encode_batch(["the fox"], 16, pair=["lazy dog"])
    row = ids_p[0][: int(mask_p[0].sum())].tolist()
    assert row.count(t.sep_id) >= 3  # <s> a </s></s> b </s>


def test_hf_tokenizer_chunker_integration(tok_file):
    from tensortruth_tpu.index.chunker import hierarchical_chunk
    from tensortruth_tpu.tokenization import load_tokenizer

    t = load_tokenizer(tok_file)
    text = "the quick brown fox jumps over the lazy dog " * 50
    nodes = hierarchical_chunk(text, t, "doc", chunk_sizes=[64, 16], chunk_overlap=4)
    leaves = [n for n in nodes if n.is_leaf]
    assert len(leaves) > 1
    for n in nodes:
        assert n.text == text[n.start : n.end]
