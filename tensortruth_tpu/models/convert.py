"""HF checkpoint → tensortruth_tpu parameter pytree conversion.

Converts a torch ``XLMRobertaModel`` / ``XLMRobertaForSequenceClassification``
state dict (as shipped for BAAI/bge-m3 and BAAI/bge-reranker-v2-m3, loaded by
the reference via sentence-transformers — reference model_manager.py:254-337)
into the stacked-layer pytree consumed by :mod:`tensortruth_tpu.models.xlmr`.

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
    for p in ("roberta.", "model.", ""):
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
        params["classifier"] = {
            "dense_w": jnp.asarray(_np(sd["classifier.dense.weight"]).T, dtype),
            "dense_b": jnp.asarray(_np(sd["classifier.dense.bias"]), dtype),
            "out_w": jnp.asarray(_np(sd["classifier.out_proj.weight"]).T, dtype),
            "out_b": jnp.asarray(_np(sd["classifier.out_proj.bias"]), dtype),
        }
    return params


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
