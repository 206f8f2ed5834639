"""HuggingFace Llama checkpoint import (≡ modelling/llama.py:221-292).

- config mapping: hidden_size→embed_dim, optional head_dim, rope_theta→rope_base,
  rope_scaling.rope_type=="llama3" → is_llama3_1 (≡ _get_hf_config, llama.py:234-253).
- key renaming: strips "model.", maps q/k/v/o projections, gate/up/down MLP and the two
  layernorms to this framework's names (≡ _rename_hf_key, llama.py:256-270).
- weights: safetensors preferred, torch .bin fallback; loaded lazily tensor-by-tensor and
  stacked per layer on a leading axis (the scan layout). Linear weights are [out, in] in
  HF and stored here as kernel [in, out].

Works from a local directory (offline tests create one with transformers) or a hub id
(downloads gated on network availability).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models.llama import LlamaConfig


def _resolve(model_id_or_path: str, filename: str) -> str:
    p = Path(model_id_or_path)
    if p.is_dir():
        return str(p / filename)
    from huggingface_hub import hf_hub_download

    return hf_hub_download(model_id_or_path, filename)


def _list_weight_files(model_id_or_path: str) -> list[str]:
    p = Path(model_id_or_path)
    if p.is_dir():
        for ext in (".safetensors", ".bin"):
            files = sorted(str(f) for f in p.glob(f"*{ext}"))
            if files:
                return files
        raise RuntimeError(f"No weights found in {model_id_or_path}")
    from huggingface_hub import hf_hub_download, list_repo_files

    for ext in (".safetensors", ".bin"):
        names = [x for x in list_repo_files(model_id_or_path) if x.endswith(ext)]
        if names:
            return [hf_hub_download(model_id_or_path, n) for n in sorted(names)]
    raise RuntimeError(f"No weights found for {model_id_or_path}")


def load_hf_config(model_id_or_path: str, **overrides) -> LlamaConfig:
    with open(_resolve(model_id_or_path, "config.json")) as f:
        hf = json.load(f)
    assert hf["architectures"][0] == "LlamaForCausalLM", hf["architectures"]
    config = LlamaConfig(
        embed_dim=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        head_dim=hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf["num_key_value_heads"],
        intermediate_dim=hf["intermediate_size"],
        vocab_size=hf["vocab_size"],
    )
    if "rope_theta" in hf:
        config = config.replace(rope_base=float(hf["rope_theta"]))
    rs = hf.get("rope_scaling")
    if rs is not None and rs.get("rope_type", rs.get("type")) == "llama3":
        # carry the checkpoint's own rescale parameters — Llama-3.1 uses factor 8,
        # Llama-3.2 uses factor 32; assuming one for the other corrupts long-context rope
        config = config.replace(
            is_llama3_1=True,
            rope_scale_factor=float(rs.get("factor", 8.0)),
            rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            rope_old_context_len=int(rs.get("original_max_position_embeddings", 8192)),
        )
    if hf.get("tie_word_embeddings", False):
        config = config.replace(tied_embeddings=True)
    return config.replace(**overrides)


def _iter_hf_tensors(files: list[str]):
    """Yield (hf_key, numpy array) from safetensors or torch .bin files."""
    import torch

    def to_np(v: "torch.Tensor") -> np.ndarray:
        # bf16 -> fp32 is exact; the final cast back to bf16 in _to_jnp round-trips
        return v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()

    for path in files:
        if path.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(path, framework="pt") as f:
                for k in f.keys():
                    yield k, to_np(f.get_tensor(k))
        else:
            sd = torch.load(path, map_location="cpu", weights_only=True, mmap=True)
            for k, v in sd.items():
                yield k, to_np(v)


_LAYER_RE = re.compile(r"^model\.layers\.(\d+)\.(.+)$")

# hf suffix -> (tree path inside params["layers"], transpose?)
_LAYER_MAP = {
    "self_attn.q_proj.weight": (("attention", "wq", "kernel"), True),
    "self_attn.k_proj.weight": (("attention", "wk", "kernel"), True),
    "self_attn.v_proj.weight": (("attention", "wv", "kernel"), True),
    "self_attn.o_proj.weight": (("attention", "wo", "kernel"), True),
    "mlp.gate_proj.weight": (("feed_forward", "w1", "kernel"), True),
    "mlp.up_proj.weight": (("feed_forward", "w3", "kernel"), True),
    "mlp.down_proj.weight": (("feed_forward", "w2", "kernel"), True),
    "input_layernorm.weight": (("attention_norm", "scale"), False),
    "post_attention_layernorm.weight": (("ffn_norm", "scale"), False),
}

_TOP_MAP = {
    "model.embed_tokens.weight": (("tok_embeddings", "weight"), False),
    "model.norm.weight": (("norm", "scale"), False),
    "lm_head.weight": (("output", "kernel"), True),
}


def _to_jnp(arr, dtype):
    # numpy may hand us ml_dtypes bfloat16 arrays from safetensors — jnp handles them
    return jnp.asarray(arr).astype(dtype)


def load_llama(model_id_or_path: str, dtype=jnp.bfloat16, **config_overrides):
    """Returns (params, config). config_overrides ≡ Llama.from_hf(**kwargs)."""
    config = load_hf_config(model_id_or_path, **config_overrides)
    files = _list_weight_files(model_id_or_path)

    per_layer: dict[tuple, dict[int, np.ndarray]] = {}
    top: dict[tuple, np.ndarray] = {}
    for key, arr in _iter_hf_tensors(files):
        m = _LAYER_RE.match(key)
        if m:
            idx = int(m.group(1))
            path, transpose = _LAYER_MAP[m.group(2)]
            per_layer.setdefault(path, {})[idx] = arr.T if transpose else arr
        else:
            path, transpose = _TOP_MAP[key]
            top[path] = arr.T if transpose else arr

    def set_path(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    params: dict = {"layers": {}}
    for path, value in top.items():
        set_path(params, path, _to_jnp(value, dtype))
    for path, by_idx in per_layer.items():
        assert len(by_idx) == config.num_layers, (path, len(by_idx), config.num_layers)
        stacked = np.stack([by_idx[i] for i in range(config.num_layers)])
        set_path(params["layers"], path, _to_jnp(stacked, dtype))

    # tied-embedding models (Llama-3.2 style) ship no lm_head; with
    # config.tied_embeddings the head reads the embedding matrix directly (one shared
    # weight, shared gradient) so nothing to materialize. If the config did NOT declare
    # tying but lm_head is absent, fall back to an explicit transposed copy.
    if ("output", "kernel") not in top and not config.tied_embeddings:
        params["output"] = {"kernel": params["tok_embeddings"]["weight"].T}
    if config.tied_embeddings:
        params.pop("output", None)  # some checkpoints ship a redundant lm_head copy

    return params, config
