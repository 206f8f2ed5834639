"""int8 KV cache: rowwise quantization bound, the Pallas int8 decode kernel vs the
dequantized oracle, model-level routing, and generation end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.models import llama
from llama_x_tpu.ops import decode_attention as da
from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(da, "INTERPRET", True)


def test_quantize_kv_roundtrip_bound():
    """Rowwise symmetric quant: |dequant - x| <= scale/2 per element (rint)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 4, 17, 64)).astype(np.float32))
    q, s = llama.quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s)[..., None] - np.asarray(x))
    assert (err <= np.asarray(s)[..., None] / 2 + 1e-7).all()


def test_int8_kernel_vs_dequant_oracle():
    """decode_attention_int8 must equal dense attention over the DEQUANTIZED cache —
    the kernel's in-VMEM dequant is exact (int8 values are exact in bf16/f32; the
    scale folds linearly into scores/probabilities)."""
    rng = np.random.default_rng(1)
    B, Hq, Hkv, S_max, D = 2, 8, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    k_i8, k_s = llama.quantize_kv_rows(k)
    v_i8, v_s = llama.quantize_kv_rows(v)
    for lens in ([1, 511], [128, 300], [512, 512], [37, 256]):
        kv_len = jnp.asarray(lens, jnp.int32)
        got = da.decode_attention_int8(q, k_i8, k_s, v_i8, v_s, kv_len, 1.0 / D**0.5)
        kd = llama.dequant_kv((k_i8, k_s)).astype(jnp.float32)
        vd = llama.dequant_kv((v_i8, v_s)).astype(jnp.float32)
        mi = MaskInfo(causal=True, kv_len=kv_len, q_positions=kv_len[:, None] - 1)
        want = dot_product_attention(q, kd.transpose(0, 2, 1, 3), vd.transpose(0, 2, 1, 3), mi)
        # bf16 rounding of dequant_kv's output vs the kernel's f32 score-fold is the
        # only difference; keep it visible with a tight-but-not-exact tolerance
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_int8_kernel_multi_query_staircase():
    """Small-Sq over the int8 cache (speculative verify with a quantized cache): the
    kernel's per-query staircase + in-VMEM dequant vs the dequantized oracle."""
    rng = np.random.default_rng(7)
    B, sq, Hq, Hkv, S_max, D = 2, 4, 8, 4, 512, 128
    q = jnp.asarray(rng.standard_normal((B, sq, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    k_i8, k_s = llama.quantize_kv_rows(k)
    v_i8, v_s = llama.quantize_kv_rows(v)
    pos = jnp.asarray([60, 255], jnp.int32)
    qpos = pos[:, None] + jnp.arange(sq, dtype=jnp.int32)[None, :]
    mi = MaskInfo(causal=True, q_positions=qpos, kv_len=pos + sq)
    assert da.decode_supported(q.shape, k_i8.shape, mi)
    lens = da.effective_lens(mi, B, sq)
    got = da.decode_attention_int8(q, k_i8, k_s, v_i8, v_s, lens, 1.0 / D**0.5)
    kd = llama.dequant_kv((k_i8, k_s)).astype(jnp.float32)
    vd = llama.dequant_kv((v_i8, v_s)).astype(jnp.float32)
    want = dot_product_attention(q, kd.transpose(0, 2, 1, 3), vd.transpose(0, 2, 1, 3), mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_model_decode_int8_cache_kernel_vs_xla():
    """llama.forward decode over an int8 cache: kernel routing (interpret) vs the XLA
    dequant fallback on identical params/cache must agree."""
    config = llama.tiny_config(
        embed_dim=256, num_layers=2, head_dim=128, num_heads=2, num_kv_heads=1,
        intermediate_dim=512, vocab_size=512, max_seq_len=256, attn_impl="auto",
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(1, 512, (1, 100)), jnp.int32)

    def run(cfg):
        cache = llama.init_kv_cache(cfg, 1, dtype=jnp.int8)
        pos = jnp.arange(100, dtype=jnp.int32)
        _, cache = llama.forward(params, cfg, prompt, kv_cache=cache, input_pos=pos)
        tok = jnp.asarray([[7]], jnp.int32)
        logits, _ = llama.forward(
            params, cfg, tok, kv_cache=cache,
            input_pos=jnp.asarray([100], jnp.int32), kv_len=jnp.asarray([101], jnp.int32),
        )
        return logits

    got = run(config)
    want = run(config.replace(attn_impl="xla"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_int8_cache_close_to_f32_cache():
    """Quantization error budget at the logits: int8 cache decode must track the f32
    cache within the rowwise-quant noise floor (not bit-exact, but close — this guards
    against scale/layout bugs that would be silently 'plausible but wrong')."""
    config = llama.tiny_config(
        embed_dim=256, num_layers=2, head_dim=64, num_heads=4, num_kv_heads=2,
        intermediate_dim=512, vocab_size=512, max_seq_len=256, attn_impl="xla",
    )
    params = llama.init(jax.random.PRNGKey(1), config, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(1, 512, (2, 64)), jnp.int32)

    def run(dtype):
        cache = llama.init_kv_cache(config, 2, dtype=dtype)
        pos = jnp.arange(64, dtype=jnp.int32)
        _, cache = llama.forward(params, config, prompt, kv_cache=cache, input_pos=pos)
        tok = jnp.asarray([[7], [9]], jnp.int32)
        logits, _ = llama.forward(
            params, config, tok, kv_cache=cache,
            input_pos=jnp.asarray([64], jnp.int32), kv_len=jnp.asarray([65, 65], jnp.int32),
        )
        return np.asarray(logits)

    got, want = run(jnp.int8), run(jnp.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.05 * scale, (np.abs(got - want).max(), scale)


def test_generate_and_speculative_run_with_int8_cache():
    from llama_x_tpu.models.generate import generate
    from llama_x_tpu.models.speculative import generate_speculative

    config = llama.tiny_config(
        embed_dim=128, num_layers=2, head_dim=32, num_heads=4, num_kv_heads=2,
        intermediate_dim=256, vocab_size=256, max_seq_len=128, attn_impl="xla",
    )
    params = llama.init(jax.random.PRNGKey(2), config, dtype=jnp.float32)
    prompt = jnp.asarray(np.random.default_rng(5).integers(1, 256, (1, 16)), jnp.int32)
    out = generate(params, config, prompt, max_new_tokens=8, cache_dtype=jnp.int8)
    assert out.shape == (1, 8)
    out2, stats = generate_speculative(
        params, config, params, config, prompt, max_new_tokens=8, gamma=2,
        cache_dtype=jnp.int8,
    )
    assert out2.shape == (1, 8) and int(stats["target_passes"]) >= 1

    # batched (B=2): per-row acceptance drives the vmapped QUANTIZED cache scatter
    # (data + scale sides) — the int8 analogue of the bf16 per-row put() path
    bprompt = jnp.asarray(np.random.default_rng(6).integers(1, 256, (2, 12)), jnp.int32)
    out3, stats3 = generate_speculative(
        params, config, params, config, bprompt, max_new_tokens=8, gamma=2,
        cache_dtype=jnp.int8,
    )
    assert out3.shape == (2, 8) and stats3["tokens_emitted"].shape == (2,)
