"""BERT-family support: numerical parity vs HF torch + architecture detection.

The reference accepts any HF embedding/reranker model id through its config
and rerankers routes (reference api/routes/rerankers.py:79-121,
services/model_manager.py:254-337) — sentence-transformers resolves the
architecture from the checkpoint. This engine does the same offline:
models/convert.py::config_from_hf reads the checkpoint's own config.json,
and the shared encoder (models/xlmr.py) covers the BERT family via
position_style="bert", segment (token-type) ids, and mean pooling.

Parity targets here are the MiniLM-class models users actually bring:
sentence-transformers/all-MiniLM-* (BERT embedder, mean pooling) and
cross-encoder/ms-marco-MiniLM-* (BERT reranker, segment ids).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from tensortruth_tpu.models.convert import config_from_hf, convert_state_dict
from tensortruth_tpu.models.xlmr import (
    XLMRConfig,
    cls_embed,
    encoder_forward,
    rerank_logits,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY_BERT = dict(
    vocab_size=512,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=96,
    type_vocab_size=2,
    pad_token_id=0,
    layer_norm_eps=1e-12,
)


def _tiny_cfg(num_labels=0, pooling="cls"):
    return XLMRConfig(
        vocab_size=TINY_BERT["vocab_size"],
        hidden_size=TINY_BERT["hidden_size"],
        num_layers=TINY_BERT["num_hidden_layers"],
        num_heads=TINY_BERT["num_attention_heads"],
        intermediate_size=TINY_BERT["intermediate_size"],
        max_position=TINY_BERT["max_position_embeddings"],
        type_vocab_size=TINY_BERT["type_vocab_size"],
        pad_token_id=TINY_BERT["pad_token_id"],
        layer_norm_eps=TINY_BERT["layer_norm_eps"],
        num_labels=num_labels,
        position_style="bert",
        pooling=pooling,
    )


def _batch(rng, bsz=3, seq=17, with_types=False):
    ids = rng.integers(5, TINY_BERT["vocab_size"], size=(bsz, seq)).astype(np.int32)
    mask = np.ones((bsz, seq), dtype=np.int32)
    if bsz > 1:
        mask[1, 10:] = 0
    if bsz > 2:
        mask[2, 5:] = 0
    ids[mask == 0] = TINY_BERT["pad_token_id"]
    if not with_types:
        return ids, mask
    # segment 1 starts mid-sequence on real tokens only (pair layout)
    types = np.zeros((bsz, seq), dtype=np.int32)
    for i in range(bsz):
        n_real = int(mask[i].sum())
        types[i, n_real // 2 : n_real] = 1
    return ids, mask, types


@pytest.fixture(scope="module")
def torch_bert():
    torch.manual_seed(7)
    hf_cfg = transformers.BertConfig(**TINY_BERT)
    model = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    return model


def test_bert_encoder_parity_f32(torch_bert, rng):
    ids, mask, types = _batch(rng, with_types=True)
    with torch.no_grad():
        ref = torch_bert(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(types.astype(np.int64)),
        ).last_hidden_state.numpy()

    params = convert_state_dict(
        torch_bert.state_dict(),
        num_layers=TINY_BERT["num_hidden_layers"],
        dtype=jnp.float32,
    )
    out = np.asarray(
        encoder_forward(
            params, jnp.asarray(ids), jnp.asarray(mask), _tiny_cfg(),
            type_ids=jnp.asarray(types),
        )
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_bert_type_ids_change_output(torch_bert, rng):
    """Segment ids must actually flow: zeros vs real segments differ."""
    ids, mask, types = _batch(rng, with_types=True)
    params = convert_state_dict(
        torch_bert.state_dict(),
        num_layers=TINY_BERT["num_hidden_layers"],
        dtype=jnp.float32,
    )
    cfg = _tiny_cfg()
    with_types = np.asarray(
        encoder_forward(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg,
            type_ids=jnp.asarray(types),
        )
    )
    without = np.asarray(
        encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    assert np.abs(with_types - without).max() > 1e-3


def test_mean_pooling_parity(torch_bert, rng):
    """cfg.pooling='mean' == sentence-transformers masked mean + L2 norm."""
    ids, mask = _batch(rng)
    with torch.no_grad():
        hidden = torch_bert(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    m = mask.astype(np.float32)[:, :, None]
    ref = (hidden * m).sum(axis=1) / m.sum(axis=1)
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)

    params = convert_state_dict(
        torch_bert.state_dict(),
        num_layers=TINY_BERT["num_hidden_layers"],
        dtype=jnp.float32,
    )
    emb = np.asarray(
        cls_embed(
            params, jnp.asarray(ids), jnp.asarray(mask), _tiny_cfg(pooling="mean")
        )
    )
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(emb, ref, rtol=2e-4, atol=2e-4)


def test_bert_reranker_parity(rng):
    """BertForSequenceClassification head (pooler+tanh → classifier) parity."""
    torch.manual_seed(11)
    hf_cfg = transformers.BertConfig(**TINY_BERT, num_labels=1)
    model = transformers.BertForSequenceClassification(hf_cfg)
    model.eval()
    ids, mask, types = _batch(rng, with_types=True)
    with torch.no_grad():
        ref = (
            model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                token_type_ids=torch.tensor(types.astype(np.int64)),
            )
            .logits.numpy()[:, 0]
        )

    params = convert_state_dict(
        model.state_dict(),
        num_layers=TINY_BERT["num_hidden_layers"],
        num_labels=1,
        dtype=jnp.float32,
    )
    out = np.asarray(
        rerank_logits(
            params, jnp.asarray(ids), jnp.asarray(mask), _tiny_cfg(num_labels=1),
            type_ids=jnp.asarray(types),
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


# -- architecture detection ---------------------------------------------------


def _write_config(tmp_path, **extra):
    cfg = dict(TINY_BERT, model_type="bert")
    cfg.update(extra)
    (tmp_path / "config.json").write_text(json.dumps(cfg))


def test_config_from_hf_bert(tmp_path):
    _write_config(tmp_path)
    cfg = config_from_hf(str(tmp_path))
    assert cfg.position_style == "bert"
    assert cfg.pooling == "cls"  # no 1_Pooling dir
    assert cfg.num_layers == 3 and cfg.hidden_size == 64
    assert cfg.type_vocab_size == 2 and cfg.pad_token_id == 0


def test_config_from_hf_mean_pooling(tmp_path):
    _write_config(tmp_path)
    pool = tmp_path / "1_Pooling"
    pool.mkdir()
    (pool / "config.json").write_text(
        json.dumps({"pooling_mode_cls_token": False, "pooling_mode_mean_tokens": True})
    )
    assert config_from_hf(str(tmp_path)).pooling == "mean"
    # rerankers never mean-pool: num_labels>0 ignores the pooling config
    assert config_from_hf(str(tmp_path), num_labels=1).pooling == "cls"


def test_config_from_hf_xlmr(tmp_path):
    (tmp_path / "config.json").write_text(
        json.dumps(
            dict(
                model_type="xlm-roberta", vocab_size=512, hidden_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=128, max_position_embeddings=130,
                pad_token_id=1,
            )
        )
    )
    cfg = config_from_hf(str(tmp_path), num_labels=1)
    assert cfg.position_style == "xlmr" and cfg.num_labels == 1


def test_config_from_hf_unknown_or_missing(tmp_path):
    assert config_from_hf(str(tmp_path)) is None  # no config.json
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "t5"}))
    assert config_from_hf(str(tmp_path)) is None  # unsupported family


def test_manager_loads_bert_checkpoint_end_to_end(tmp_path, rng):
    """A local MiniLM-style checkpoint dir (safetensors + config.json +
    1_Pooling) loads through ModelManager with the detected architecture."""
    from safetensors.numpy import save_file

    from tensortruth_tpu.models.manager import ModelManager, ModelSpec

    torch.manual_seed(3)
    model = transformers.BertModel(transformers.BertConfig(**TINY_BERT))
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    _write_config(tmp_path)
    pool = tmp_path / "1_Pooling"
    pool.mkdir()
    (pool / "config.json").write_text(json.dumps({"pooling_mode_mean_tokens": True}))

    mgr = ModelManager()
    emb = mgr._load_embedder(
        ModelSpec("custom/mini-bert", dtype="float32", local_dir=str(tmp_path))
    )
    assert emb.cfg.position_style == "bert"
    assert emb.cfg.pooling == "mean"
    assert emb.cfg.num_layers == TINY_BERT["num_hidden_layers"]
    # max_length clamped to BERT position capacity (96, not 96-2... but ≤ 96)
    assert emb.max_length <= TINY_BERT["max_position_embeddings"]
    out = emb.encode(["hello world", "a longer text with several words"])
    assert out.shape == (2, TINY_BERT["hidden_size"])
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_reranker_bert_pairs_end_to_end():
    """Full score_pairs path with BERT conventions: single-SEP layout,
    host-derived segment ids, sigmoid scores."""
    from tensortruth_tpu.models.reranker import Reranker
    from tensortruth_tpu.tokenization.tokenizer import SimpleTokenizer

    cfg = _tiny_cfg(num_labels=1)
    tok = SimpleTokenizer(vocab_size=512, sep_style="bert")
    rr = Reranker.random_init(
        cfg, tok, dtype=jnp.float32, max_length=64,
        batch_buckets=(4, 8), seq_buckets=(32, 64),
    )
    assert rr._needs_type_ids
    scores = rr.score_pairs(
        [("what is jax", f"doc number {i} about arrays") for i in range(5)]
    )
    assert scores.shape == (5,)
    assert ((scores >= 0) & (scores <= 1)).all()
    # same pair twice scores identically (deterministic path)
    s2 = rr.score_pairs([("what is jax", "doc number 0 about arrays")] * 2)
    np.testing.assert_allclose(s2[0], s2[1], rtol=1e-5)


def test_bert_pair_layout_single_sep():
    from tensortruth_tpu.tokenization.tokenizer import SimpleTokenizer, _batch_encode

    tok = SimpleTokenizer(vocab_size=512, sep_style="bert")
    ids, mask = _batch_encode(tok, ["a b"], 32, ["c d e"])
    row = ids[0][mask[0] > 0]
    assert row[0] == tok.cls_id
    assert (row == tok.sep_id).sum() == 2  # one mid + one trailing
    # XLM-R layout keeps the double separator
    tok_x = SimpleTokenizer(vocab_size=512)
    ids, mask = _batch_encode(tok_x, ["a b"], 32, ["c d e"])
    assert (ids[0][mask[0] > 0] == tok_x.sep_id).sum() == 3


def test_hf_tokenizer_detects_bert_specials(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")

    vocab = {
        "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
        "hello": 4, "world": 5, "##s": 6,
    }
    tok = tokenizers.Tokenizer(tokenizers.models.WordPiece(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.Whitespace()
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    from tensortruth_tpu.tokenization.tokenizer import HFTokenizer

    ht = HFTokenizer(path)
    assert ht.sep_style == "bert"
    assert (ht.pad_id, ht.cls_id, ht.sep_id) == (0, 2, 3)
