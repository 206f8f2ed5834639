"""HuggingFace Llama checkpoint import (≡ modelling/llama.py:221-292) — streaming.

- config mapping: hidden_size→embed_dim, optional head_dim, rope_theta→rope_base,
  rope_scaling.rope_type=="llama3" → is_llama3_1 (≡ _get_hf_config, llama.py:234-253).
- key renaming: strips "model.", maps q/k/v/o projections, gate/up/down MLP and the two
  layernorms to this framework's names (≡ _rename_hf_key, llama.py:256-270).
- weights: safetensors preferred, torch .bin fallback. Loading is STREAMING: no tensor
  is ever materialized whole-model- or whole-layer-stacked on the host. Each param leaf
  is built with ``jax.make_array_from_callback``; the callback reads only the byte
  ranges of the requested device shard (safetensors ``get_slice`` / mmap'd torch
  tensors) and converts chunk-by-chunk straight to the target dtype — the TPU-native
  analogue of the reference's meta-device + ``assign=True`` load economics
  (modelling/llama.py:225-231, 273-292): peak host memory is one leaf-shard, not the
  model. bf16 checkpoints never take an fp32 detour (safetensors hands back ml_dtypes
  bfloat16 views).
- sharded placement: pass ``mesh=`` to place every leaf directly onto its
  parallel/sharding.py PartitionSpec as it loads — each host reads only its addressable
  shards (multi-host FSDP import reads 1/N of the checkpoint per host).

Linear weights are [out, in] in HF and stored here as kernel [in, out]; per-layer
tensors are stacked on a leading axis (the scan layout).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models.llama import LlamaConfig

# test/telemetry hook: chunk sizes the streaming loader actually materialized on host
LOAD_STATS = {"chunk_bytes": 0, "max_chunk_bytes": 0, "n_chunks": 0}


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


# ---------------------------------------------------------------------------
# lazy per-tensor readers
# ---------------------------------------------------------------------------


class _TensorIndex:
    """key → lazy slice-reader over a set of safetensors/.bin files.

    Readers return numpy chunks in the source dtype (bf16 stays bf16 via ml_dtypes);
    only the requested ranges are read from disk (safetensors get_slice / torch mmap).
    """

    def __init__(self, files: list[str]):
        self._safetensors = {}  # key -> safe_open handle
        self._torch = {}  # key -> mmap'd torch tensor
        self.shapes: dict[str, tuple[int, ...]] = {}
        for path in files:
            if path.endswith(".safetensors"):
                from safetensors import safe_open

                f = safe_open(path, framework="numpy")
                for k in f.keys():
                    self._safetensors[k] = f
                    self.shapes[k] = tuple(f.get_slice(k).get_shape())
            else:
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=True, mmap=True)
                for k, v in sd.items():
                    self._torch[k] = v
                    self.shapes[k] = tuple(v.shape)

    def keys(self):
        return list(self.shapes)

    def read(self, key: str, idx: tuple[slice, ...]) -> np.ndarray:
        if key in self._safetensors:
            chunk = self._safetensors[key].get_slice(key)[idx]
        else:
            import torch

            t = self._torch[key][idx]
            if t.dtype == torch.bfloat16:
                import ml_dtypes

                chunk = t.contiguous().view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            else:
                chunk = t.numpy()
        LOAD_STATS["chunk_bytes"] += chunk.nbytes
        LOAD_STATS["max_chunk_bytes"] = max(LOAD_STATS["max_chunk_bytes"], chunk.nbytes)
        LOAD_STATS["n_chunks"] += 1
        return chunk


_LAYER_RE = re.compile(r"^model\.layers\.(\d+)\.(.+)$")

# non-parameter buffers to silently skip (present in many published checkpoints)
_SKIP_BUFFERS = re.compile(r"(rotary_emb\.inv_freq|\.attn\.(bias|masked_bias))$")

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


def _norm_idx(index, shape: tuple[int, ...]) -> tuple[slice, ...]:
    """Normalize a jax shard Index (tuple of slices, possibly open-ended) to concrete
    start:stop slices over ``shape``."""
    out = []
    for sl, n in zip(index, shape):
        start = 0 if sl.start is None else sl.start
        stop = n if sl.stop is None else sl.stop
        assert sl.step in (None, 1), "sharded leaves are contiguous-sliced"
        out.append(slice(start, stop))
    return tuple(out)


def _make_leaf(shape, dtype, sharding, read_target):
    """Build one device array; read_target(norm_idx) -> np chunk for that target slice."""

    def cb(dev_index):
        idx = _norm_idx(dev_index, shape)
        return np.ascontiguousarray(read_target(idx)).astype(dtype, copy=False)

    return jax.make_array_from_callback(tuple(shape), sharding, cb)


def _transposed_reader(index: _TensorIndex, key: str):
    """Target is source.T (2D): target idx (rows, cols) reads source (cols, rows)."""

    def read(idx):
        r, c = idx
        return index.read(key, (c, r)).T

    return read


def _stacked_reader(index: _TensorIndex, keys_by_layer: list[str], transpose: bool):
    """Target [L, ...]: idx[0] selects layers, read each layer's slice and stack."""

    def read(idx):
        lsl, *rest = idx
        chunks = []
        for layer in range(lsl.start, lsl.stop):
            if transpose:
                r, c = rest
                chunks.append(index.read(keys_by_layer[layer], (c, r)).T)
            else:
                chunks.append(index.read(keys_by_layer[layer], tuple(rest)))
        return np.stack(chunks)

    return read


def load_llama(model_id_or_path: str, dtype=jnp.bfloat16, mesh=None, **config_overrides):
    """Returns (params, config). config_overrides ≡ Llama.from_hf(**kwargs).

    mesh: optional jax.sharding.Mesh — leaves are placed onto their
    parallel/sharding.py PartitionSpecs as they stream in (each host reads only its
    addressable shards). Without a mesh, leaves land on the default device whole.
    """
    config = load_hf_config(model_id_or_path, **config_overrides)
    index = _TensorIndex(_list_weight_files(model_id_or_path))
    np_dtype = jnp.dtype(dtype)

    # plan: target leaf path -> (shape, reader)
    per_layer: dict[tuple, dict[int, str]] = {}  # tree path -> {layer: hf key}
    top: dict[tuple, str] = {}
    unmapped: list[str] = []
    for key in index.keys():
        if _SKIP_BUFFERS.search(key):
            continue  # non-parameter buffers many real checkpoints ship (Llama-2-era
            # .bin files carry rotary_emb.inv_freq per layer — recomputed here)
        m = _LAYER_RE.match(key)
        if m:
            entry = _LAYER_MAP.get(m.group(2))
            if entry is None:
                unmapped.append(key)
                continue
            per_layer.setdefault(entry[0], {})[int(m.group(1))] = key
        elif key in _TOP_MAP:
            top[_TOP_MAP[key][0]] = key
        else:
            unmapped.append(key)
    if unmapped:
        # one coherent error listing EVERYTHING unknown (≡ load_state_dict's unexpected
        # keys report, /root/reference/modelling/llama.py:256-270) instead of a bare
        # KeyError on the first one
        raise ValueError(
            f"{model_id_or_path}: {len(unmapped)} checkpoint key(s) do not map onto the "
            f"Llama parameter tree: {sorted(unmapped)[:20]}"
            + (" ..." if len(unmapped) > 20 else "")
        )

    plan: dict[tuple, tuple[tuple[int, ...], object]] = {}
    for path, key in top.items():
        transpose = _TOP_MAP[key][1]
        shape = index.shapes[key]
        if transpose:
            plan[path] = (shape[::-1], _transposed_reader(index, key))
        else:
            plan[path] = (shape, lambda idx, k=key: index.read(k, idx))
    for path, by_idx in per_layer.items():
        assert len(by_idx) == config.num_layers, (path, len(by_idx), config.num_layers)
        keys_by_layer = [by_idx[i] for i in range(config.num_layers)]
        transpose = _LAYER_MAP[keys_by_layer[0].split(".", 3)[-1]][1]
        shape = index.shapes[keys_by_layer[0]]
        tgt = (config.num_layers, *(shape[::-1] if transpose else shape))
        plan[("layers", *path)] = (tgt, _stacked_reader(index, keys_by_layer, transpose))

    # tied-embedding models (Llama-3.2 style) ship no lm_head; with
    # config.tied_embeddings the head reads the embedding matrix directly (one shared
    # weight, shared gradient) so nothing to materialize. If the config did NOT declare
    # tying but lm_head is absent, stream an explicit transposed copy of the embedding.
    if ("output", "kernel") not in plan and not config.tied_embeddings:
        key = top[("tok_embeddings", "weight")]
        plan[("output", "kernel")] = (index.shapes[key][::-1], _transposed_reader(index, key))
    if config.tied_embeddings:
        plan.pop(("output", "kernel"), None)  # some checkpoints ship a redundant copy

    def sharding_for(path: tuple, ndim: int):
        if mesh is None:
            return jax.sharding.SingleDeviceSharding(jax.devices()[0])
        from llama_x_tpu.parallel.sharding import _spec_for

        pp = "pp" in mesh.shape and mesh.shape["pp"] > 1
        return jax.sharding.NamedSharding(mesh, _spec_for("/".join(path), ndim, pp=pp))

    params: dict = {}
    for path, (shape, reader) in plan.items():
        leaf = _make_leaf(shape, np_dtype, sharding_for(path, len(shape)), reader)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    return params, config


# ---------------------------------------------------------------------------
# export: params -> HF checkpoint (the inverse of load_llama)
# ---------------------------------------------------------------------------

_ST_DTYPES = {"bfloat16": "BF16", "float32": "F32", "float16": "F16"}


def _write_safetensors(path: Path, tensors: dict[str, tuple[tuple[int, ...], str, object]]):
    """Stream a safetensors file: tensors[name] = (shape, np_dtype_name, produce_fn).
    produce_fn() is called once per tensor AT WRITE TIME, so peak host memory is one
    tensor, not the model (mirrors the import's streaming economics)."""
    import ml_dtypes  # noqa: F401  (np dtype registry for bfloat16)

    itemsize = {"bfloat16": 2, "float32": 4, "float16": 2}
    header: dict[str, dict] = {}
    offset = 0
    for name, (shape, dt, _) in tensors.items():
        nbytes = int(np.prod(shape or (1,))) * itemsize[dt]
        header[name] = {"dtype": _ST_DTYPES[dt], "shape": list(shape), "data_offsets": [offset, offset + nbytes]}
        offset += nbytes
    blob = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
        for name, (shape, dt, produce) in tensors.items():
            arr = np.ascontiguousarray(produce())
            assert arr.shape == tuple(shape) and str(arr.dtype) == dt, (name, arr.shape, arr.dtype)
            f.write(arr.tobytes())


def _merged_kernel(lin: dict) -> jnp.ndarray:
    """Linear leaf -> effective float kernel [..., in, out]: int8 dequantized, LoRA
    delta added, DoRA column rescale applied (merge-for-export semantics)."""
    from llama_x_tpu.adapters.lora import _dequant_stacked

    w = _dequant_stacked(lin)  # [..., in, out] fp32
    if "lora_a" in lin:
        delta = (
            lin["lora_a"].astype(jnp.float32) @ lin["lora_b"].astype(jnp.float32)
        ) * lin["lora_scale"].astype(jnp.float32)
        w_eff = w + delta
    else:
        w_eff = w
    if "m" in lin:  # DoRA: out = (x @ (W + BAs)) * m / ||W + BAs||_col
        norm = jnp.linalg.norm(w_eff, axis=-2, keepdims=True)
        w_eff = w_eff * (lin["m"].astype(jnp.float32)[..., None, :] / norm)
    return w_eff


def save_llama_hf(params: dict, config: LlamaConfig, out_dir, dtype=jnp.bfloat16):
    """Write an HF-format Llama checkpoint (config.json + model.safetensors) readable
    by ``transformers`` and by :func:`load_llama` — the reference has no export path
    at all (it torch.saves raw state dicts); this closes the round trip for users
    moving between frameworks. int8 bases are dequantized and LoRA/DoRA adapters are
    MERGED into the exported kernels."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np_dtype = jnp.dtype(dtype)
    dt_name = np_dtype.name

    hf_config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": config.embed_dim,
        "num_hidden_layers": config.num_layers,
        "head_dim": config.head_dim,
        "num_attention_heads": config.num_heads,
        "num_key_value_heads": config.num_kv_heads,
        "intermediate_size": config.intermediate_dim,
        "vocab_size": config.vocab_size,
        "max_position_embeddings": config.max_seq_len,
        "rms_norm_eps": config.norm_eps,
        "rope_theta": config.rope_base,
        "tie_word_embeddings": bool(config.tied_embeddings),
        "torch_dtype": {"bfloat16": "bfloat16", "float32": "float32", "float16": "float16"}[dt_name],
    }
    if config.is_llama3_1:
        hf_config["rope_scaling"] = {
            "rope_type": "llama3",
            "factor": config.rope_scale_factor,
            "low_freq_factor": config.rope_low_freq_factor,
            "high_freq_factor": config.rope_high_freq_factor,
            "original_max_position_embeddings": config.rope_old_context_len,
        }
    (out_dir / "config.json").write_text(json.dumps(hf_config, indent=1))

    def np_of(x):
        return np.asarray(x.astype(np_dtype))

    tensors: dict[str, tuple[tuple[int, ...], str, object]] = {}

    def add(name, shape, produce):
        tensors[name] = (tuple(int(s) for s in shape), dt_name, produce)

    emb = params["tok_embeddings"]["weight"]
    add("model.embed_tokens.weight", emb.shape, lambda: np_of(emb))
    add("model.norm.weight", params["norm"]["scale"].shape, lambda: np_of(params["norm"]["scale"]))
    if not config.tied_embeddings:
        out_k = params["output"]["kernel"]  # [D, V] -> lm_head [V, D]
        add("lm_head.weight", out_k.shape[::-1], lambda: np_of(out_k.T))

    # per-layer tensors: unstack the scan axis, merge adapters/quant, transpose
    # kernels back to HF's [out, in]
    inv_layer = {path: (suffix, transpose) for suffix, (path, transpose) in _LAYER_MAP.items()}
    layers = params["layers"]
    for path, (suffix, transpose) in sorted(inv_layer.items()):
        node = layers
        for k in path[:-1]:
            node = node[k]
        leaf_name = path[-1]
        if leaf_name == "kernel":
            lin = node  # whole linear dict (kernel|int_data + adapters)
            merged_shape = _merged_kernel_shape(lin)  # (in, out)
            for layer in range(config.num_layers):
                add(
                    f"model.layers.{layer}.{suffix}",
                    (merged_shape[1], merged_shape[0]),  # HF [out, in]
                    lambda lin=lin, layer=layer: np_of(_merged_kernel_layer(lin, layer).T),
                )
        else:
            leaf = node[leaf_name]
            for layer in range(config.num_layers):
                add(
                    f"model.layers.{layer}.{suffix}",
                    leaf.shape[1:],
                    lambda leaf=leaf, layer=layer: np_of(leaf[layer]),
                )

    _write_safetensors(out_dir / "model.safetensors", tensors)
    return out_dir


def _merged_kernel_shape(lin: dict) -> tuple[int, int]:
    from llama_x_tpu.adapters.lora import _base_kernel_in_out

    return _base_kernel_in_out(lin)


def _merged_kernel_layer(lin: dict, layer: int) -> jnp.ndarray:
    """One layer's effective [in, out] kernel (slices the stacked leaves first so only
    one layer is ever dequantized/merged on host)."""
    sliced = {k: v[layer] for k, v in lin.items() if hasattr(v, "shape") and v.ndim > 0}
    for k in ("lora_scale",):  # 0-d per-layer? lora_scale is stacked [L] or scalar
        if k in lin and getattr(lin[k], "ndim", 0) == 0:
            sliced[k] = lin[k]
    return _merged_kernel(sliced)
