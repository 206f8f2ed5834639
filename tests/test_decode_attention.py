"""Decode-attention Pallas kernel vs the XLA oracle, the model-level decode routing,
and the int8 NT-layout GEMM fallback vs the transposing form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.ops import decode_attention as da
from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(da, "INTERPRET", True)


def _setup(rng, B=2, S_max=512, Hq=8, Hkv=4, D=128):
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    q = mk((B, 1, Hq, D))
    k = mk((B, Hkv, S_max, D))  # cache storage layout
    v = mk((B, Hkv, S_max, D))
    return q, k, v


def _oracle(q, k, v, mi):
    # oracle consumes [B, S, H, D]
    return dot_product_attention(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mi)


def test_decode_kernel_vs_oracle_varied_lens():
    """Standard decode: query sits at position kv_len-1 (the oracle needs explicit
    q_positions for that; the kernel takes the window length directly)."""
    rng = np.random.default_rng(0)
    q, k, v = _setup(rng)
    B, _, _, D = q.shape
    # lengths hitting: first block only, mid-block boundary, exact block edge, full
    for lens in ([1, 511], [128, 300], [512, 512], [37, 256]):
        kv_len = jnp.asarray(lens, jnp.int32)
        got = da.decode_attention(q, k, v, kv_len, 1.0 / D**0.5)
        mi = MaskInfo(causal=True, kv_len=kv_len, q_positions=kv_len[:, None] - 1)
        want = _oracle(q, k, v, mi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_effective_lens_caps_at_query_position():
    """min(kv_len, q_pos+1): a window longer than causality allows must be capped."""
    rng = np.random.default_rng(1)
    q, k, v = _setup(rng, B=2)
    pos = jnp.asarray([[100], [200]], jnp.int32)
    kv_len = jnp.asarray([101, 450], jnp.int32)  # row 1: kv_len > pos+1, causal caps it
    mi = MaskInfo(causal=True, q_positions=pos, kv_len=kv_len)
    assert da.decode_supported(q.shape, k.shape, mi)
    lens = da.effective_lens(mi, 2)
    np.testing.assert_array_equal(np.asarray(lens), [101, 201])
    got = da.decode_attention(q, k, v, lens, 1.0 / 128**0.5)
    want = _oracle(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_kernel_gqa_group1():
    rng = np.random.default_rng(2)
    q, k, v = _setup(rng, Hq=4, Hkv=4)
    kv_len = jnp.asarray([64, 200], jnp.int32)
    got = da.decode_attention(q, k, v, kv_len, 1.0 / 128**0.5)
    mi = MaskInfo(causal=True, kv_len=kv_len, q_positions=kv_len[:, None] - 1)
    want = _oracle(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_model_decode_routes_through_kernel():
    """llama.forward decode step under attn_impl='auto' (kernel, interpret mode) must
    match attn_impl='xla' (fallback) on identical params/cache."""
    from llama_x_tpu.models import llama

    config = llama.tiny_config(
        embed_dim=256, num_layers=2, head_dim=128, num_heads=2, num_kv_heads=1,
        intermediate_dim=512, vocab_size=512, max_seq_len=256, attn_impl="auto",
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(1, 512, (1, 100)), jnp.int32)

    def run(cfg):
        cache = llama.init_kv_cache(cfg, 1, dtype=jnp.float32)
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
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_int8_nt_matches_transposed_xla():
    from llama_x_tpu.ops.int8 import _int8_mm_dequant_nt_xla, _int8_mm_dequant_xla

    rng = np.random.default_rng(4)
    M, K, N = 64, 96, 128
    a = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b_nk = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
    rs = jnp.asarray(rng.uniform(0.5, 2, (M,)), jnp.float32)
    cs = jnp.asarray(rng.uniform(0.5, 2, (N,)), jnp.float32)
    got = _int8_mm_dequant_nt_xla(a, b_nk, rs, cs, jnp.float32)
    want = _int8_mm_dequant_xla(a, b_nk.T, rs, cs, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_decode_kernel_head_dim_64():
    """hd=64 (TinyLlama-class geometry): the kernel computes it correctly, but the
    ROUTER keeps such models on XLA — measured 0.5-0.8x on v5e
    (runs/bench_decode/decode.json), the GQA group under-fills the MXU at half-width
    lanes while XLA batches all heads into one GEMM."""
    rng = np.random.default_rng(5)
    q, k, v = _setup(rng, B=2, S_max=512, Hq=8, Hkv=2, D=64)
    kv_len = jnp.asarray([33, 512], jnp.int32)
    mi = MaskInfo(causal=True, kv_len=kv_len, q_positions=kv_len[:, None] - 1)
    assert not da.decode_supported(q.shape, k.shape, mi)  # deliberate routing choice
    da.FORCE_KERNEL = True  # the bench's measurement escape hatch re-engages it
    try:
        assert da.decode_supported(q.shape, k.shape, mi)
    finally:
        da.FORCE_KERNEL = False
    got = da.decode_attention(q, k, v, kv_len, 1.0 / 64**0.5)  # capability still exact
    want = _oracle(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
