"""HF export (models/hf.py:save_llama_hf): round-trip through load_llama, and
merge-on-export semantics for int8 + LoRA trees."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.hf import load_llama, save_llama_hf


def _tiny():
    config = llama.tiny_config(
        embed_dim=64, num_layers=2, head_dim=32, num_heads=2, num_kv_heads=1,
        intermediate_dim=128, vocab_size=256, max_seq_len=64,
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    return config, params


def test_export_import_roundtrip(tmp_path):
    config, params = _tiny()
    save_llama_hf(params, config, tmp_path, dtype=jnp.float32)
    params2, config2 = load_llama(str(tmp_path), dtype=jnp.float32)
    assert config2.embed_dim == config.embed_dim
    assert config2.num_kv_heads == config.num_kv_heads
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    paths1 = {jax.tree_util.keystr(p): v for p, v in flat1}
    paths2 = {jax.tree_util.keystr(p): v for p, v in flat2}
    assert set(paths1) == set(paths2)
    for k, v in paths1.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(paths2[k]), rtol=1e-6, atol=1e-6, err_msg=k)

    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)), jnp.int32)
    l1 = llama.forward(params, config, tokens)
    l2 = llama.forward(params2, config2, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_export_merges_int8_and_lora(tmp_path):
    """Exported kernels must equal dequant(base) + B A s: forward of the re-imported
    plain model matches the quantized+adapted model (fp32, no dynamic act quant)."""
    from llama_x_tpu.adapters import apply_linear_adapter
    from llama_x_tpu.adapters.quantize import quantize_linear

    config, params = _tiny()
    q = dict(params, layers=quantize_linear(params["layers"], "int8"))
    q = dict(q, layers=apply_linear_adapter(q["layers"], "lora", jax.random.PRNGKey(1)))
    # make the LoRA delta nonzero so the merge actually matters
    q["layers"]["attention"]["wq"]["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(2), q["layers"]["attention"]["wq"]["lora_b"].shape) * 0.1
    )

    save_llama_hf(q, config, tmp_path, dtype=jnp.float32)
    merged, _ = load_llama(str(tmp_path), dtype=jnp.float32)

    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 16)), jnp.int32)
    want = llama.forward(q, config, tokens)  # int8 base + lora path
    got = llama.forward(merged, config, tokens)  # plain merged kernels
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_export_tied_embeddings_skips_head(tmp_path):
    config, params = _tiny()
    config = config.replace(tied_embeddings=True)
    params = dict(params)
    params.pop("output")
    save_llama_hf(params, config, tmp_path, dtype=jnp.float32)
    import json

    hf = json.loads((tmp_path / "config.json").read_text())
    assert hf["tie_word_embeddings"] is True
    params2, config2 = load_llama(str(tmp_path), dtype=jnp.float32)
    assert config2.tied_embeddings and "output" not in params2
