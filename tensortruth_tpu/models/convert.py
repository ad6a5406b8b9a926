"""HF checkpoint → tensortruth_tpu parameter pytree conversion.

Converts a torch encoder state dict into the stacked-layer pytree consumed
by :mod:`tensortruth_tpu.models.xlmr`. Two HF families share the identical
``encoder.layer.{i}.*`` inner layout and are both supported:

* ``XLMRobertaModel`` / ``XLMRobertaForSequenceClassification`` — BGE-M3 and
  BGE-reranker-v2-m3, the defaults (reference model_manager.py:24-25);
* ``BertModel`` / ``BertForSequenceClassification`` — MiniLM-class embedders
  (sentence-transformers/all-MiniLM-*) and rerankers
  (cross-encoder/ms-marco-MiniLM-*). The reference accepts any such HF id
  through its config/rerankers routes (reference api/routes/rerankers.py:79-121,
  model_manager.py:254-337); this engine accepts them as local checkpoints.

Classification heads differ in weight layout but not in math — Roberta's
``classifier.dense(+tanh) → classifier.out_proj`` and BERT's
``pooler.dense(+tanh) → classifier`` are the same CLS-state computation —
so both map onto the one ``classifier`` pytree read by ``rerank_logits``.

Works from either a live ``state_dict()`` (tests) or a local safetensors file
(production, when model files are on disk — this environment has no network).
torch Linear weights are (out, in) and are transposed to (in, out) here.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_state_dict(
    sd: dict, num_layers: int, num_labels: int = 0, dtype=None
) -> dict:
    """Map an HF XLM-R state dict into the stacked pytree.

    Accepts key prefixes ``""``, ``"roberta."`` (seq-classification models)
    and ``"model."``.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16

    keys = list(sd.keys())
    prefix = ""
    for p in ("roberta.", "bert.", "model.", ""):
        if any(k.startswith(p + "embeddings.word_embeddings") for k in keys):
            prefix = p
            break

    def get(name):
        return _np(sd[prefix + name])

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(num_layers):
            a = get(fmt.format(i))
            arrs.append(a.T if transpose else a)
        return np.stack(arrs)

    f32 = np.float32

    params = {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight"), dtype),
            "position": jnp.asarray(get("embeddings.position_embeddings.weight"), dtype),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight"), dtype),
            "ln_scale": jnp.asarray(get("embeddings.LayerNorm.weight"), f32),
            "ln_bias": jnp.asarray(get("embeddings.LayerNorm.bias"), f32),
        },
        "layers": {
            "q_w": jnp.asarray(stack("encoder.layer.{}.attention.self.query.weight", True), dtype),
            "q_b": jnp.asarray(stack("encoder.layer.{}.attention.self.query.bias"), dtype),
            "k_w": jnp.asarray(stack("encoder.layer.{}.attention.self.key.weight", True), dtype),
            "k_b": jnp.asarray(stack("encoder.layer.{}.attention.self.key.bias"), dtype),
            "v_w": jnp.asarray(stack("encoder.layer.{}.attention.self.value.weight", True), dtype),
            "v_b": jnp.asarray(stack("encoder.layer.{}.attention.self.value.bias"), dtype),
            "o_w": jnp.asarray(stack("encoder.layer.{}.attention.output.dense.weight", True), dtype),
            "o_b": jnp.asarray(stack("encoder.layer.{}.attention.output.dense.bias"), dtype),
            "ln1_scale": jnp.asarray(stack("encoder.layer.{}.attention.output.LayerNorm.weight"), f32),
            "ln1_bias": jnp.asarray(stack("encoder.layer.{}.attention.output.LayerNorm.bias"), f32),
            "fc1_w": jnp.asarray(stack("encoder.layer.{}.intermediate.dense.weight", True), dtype),
            "fc1_b": jnp.asarray(stack("encoder.layer.{}.intermediate.dense.bias"), dtype),
            "fc2_w": jnp.asarray(stack("encoder.layer.{}.output.dense.weight", True), dtype),
            "fc2_b": jnp.asarray(stack("encoder.layer.{}.output.dense.bias"), dtype),
            "ln2_scale": jnp.asarray(stack("encoder.layer.{}.output.LayerNorm.weight"), f32),
            "ln2_bias": jnp.asarray(stack("encoder.layer.{}.output.LayerNorm.bias"), f32),
        },
    }

    if num_labels:
        if "classifier.dense.weight" in sd:
            # RobertaClassificationHead: dense → tanh → out_proj
            params["classifier"] = {
                "dense_w": jnp.asarray(_np(sd["classifier.dense.weight"]).T, dtype),
                "dense_b": jnp.asarray(_np(sd["classifier.dense.bias"]), dtype),
                "out_w": jnp.asarray(_np(sd["classifier.out_proj.weight"]).T, dtype),
                "out_b": jnp.asarray(_np(sd["classifier.out_proj.bias"]), dtype),
            }
        else:
            # BertForSequenceClassification: pooler.dense → tanh → classifier
            # — identical computation, different key names/split.
            params["classifier"] = {
                "dense_w": jnp.asarray(_np(sd[prefix + "pooler.dense.weight"]).T, dtype),
                "dense_b": jnp.asarray(_np(sd[prefix + "pooler.dense.bias"]), dtype),
                "out_w": jnp.asarray(_np(sd["classifier.weight"]).T, dtype),
                "out_b": jnp.asarray(_np(sd["classifier.bias"]), dtype),
            }
    return params


def config_from_hf(model_dir: str, num_labels: int = 0):
    """Derive an :class:`XLMRConfig` from an HF checkpoint's ``config.json``.

    This is what lets the engine load architectures beyond the two BGE
    defaults: any local BERT/RoBERTa/XLM-R-family checkpoint resolves its
    layer counts, widths, position convention, and pooling mode from its own
    files — mirroring the reference's "any HF model id" surface (reference
    model_manager.py:254-337) without network access.

    Returns None when ``config.json`` is absent or names an unsupported
    ``model_type`` (callers fall back to the registry default).
    """
    import json
    import os

    from tensortruth_tpu.models.xlmr import XLMRConfig

    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        hf = json.load(f)

    model_type = hf.get("model_type", "")
    if model_type in ("bert",):
        position_style = "bert"
    elif model_type in ("xlm-roberta", "roberta", "camembert"):
        position_style = "xlmr"
    else:
        return None

    # sentence-transformers checkpoints record pooling in 1_Pooling/config.json
    pooling = "cls"
    pool_path = os.path.join(model_dir, "1_Pooling", "config.json")
    if num_labels == 0 and os.path.exists(pool_path):
        try:
            with open(pool_path, encoding="utf-8") as f:
                pool_cfg = json.load(f)
            if pool_cfg.get("pooling_mode_mean_tokens"):
                pooling = "mean"
        except (OSError, ValueError):
            pass

    return XLMRConfig(
        vocab_size=hf.get("vocab_size", 250002),
        hidden_size=hf.get("hidden_size", 1024),
        num_layers=hf.get("num_hidden_layers", 24),
        num_heads=hf.get("num_attention_heads", 16),
        intermediate_size=hf.get("intermediate_size", 4096),
        max_position=hf.get("max_position_embeddings", 8194),
        type_vocab_size=hf.get("type_vocab_size", 1),
        pad_token_id=hf.get("pad_token_id", 1 if position_style == "xlmr" else 0),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        num_labels=num_labels,
        position_style=position_style,
        pooling=pooling,
    )


def load_safetensors(path: str) -> dict:
    """Read a local .safetensors file into a flat name→numpy dict."""
    from safetensors.numpy import load_file

    return load_file(path)


def convert_local_checkpoint(
    model_dir: str, num_layers: int, num_labels: int = 0, dtype=None
) -> dict:
    """Convert a local HF model directory (no network)."""
    import os

    st = os.path.join(model_dir, "model.safetensors")
    index = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(st):
        sd = load_safetensors(st)
    elif os.path.exists(index):
        # sharded checkpoint: the index maps tensor name -> shard file
        import json

        with open(index, encoding="utf-8") as f:
            weight_map = json.load(f)["weight_map"]
        sd = {}
        for shard in sorted(set(weight_map.values())):
            sd.update(load_safetensors(os.path.join(model_dir, shard)))
    else:
        import torch

        pt = os.path.join(model_dir, "pytorch_model.bin")
        sd = torch.load(pt, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, num_layers=num_layers, num_labels=num_labels, dtype=dtype)
