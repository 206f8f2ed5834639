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
    np.testing.assert_array_equal(np.asarray(lens), [[101], [201]])
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


@pytest.mark.parametrize("sq", [2, 4, 8])
def test_decode_kernel_multi_query_staircase(sq):
    """Small-Sq decode (speculative verify shape): per-query windows form the causal
    staircase min(kv_len, q_pos+1); kernel must equal the oracle at ragged per-row
    depths, including rows whose windows straddle a block boundary."""
    rng = np.random.default_rng(10 + sq)
    B, S_max, Hq, Hkv, D = 3, 512, 8, 4, 128
    q = jnp.asarray(rng.standard_normal((B, sq, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    # verify-pass geometry: row b's queries sit at pos_b..pos_b+sq-1, all fresh keys
    # already written (kv_len = pos + sq)
    pos = jnp.asarray([5, 127, 300], jnp.int32)
    qpos = pos[:, None] + jnp.arange(sq, dtype=jnp.int32)[None, :]
    kv_len = pos + sq
    mi = MaskInfo(causal=True, q_positions=qpos, kv_len=kv_len)
    assert da.decode_supported(q.shape, k.shape, mi)
    lens = da.effective_lens(mi, B, sq)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(qpos + 1))
    got = da.decode_attention(q, k, v, lens, 1.0 / D**0.5)
    want = _oracle(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_kernel_draft_pair_step():
    """The speculative draft's first step: Sq=2 at positions [pos-1, pos] with
    kv_len = pos+1 (the hole-filling pair, models/speculative.py:_draft_propose)."""
    rng = np.random.default_rng(20)
    B, S_max, Hq, Hkv, D = 2, 512, 8, 4, 128
    q = jnp.asarray(rng.standard_normal((B, 2, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S_max, D)).astype(np.float32))
    pos = jnp.asarray([64, 257], jnp.int32)
    ppos = pos[:, None] + jnp.arange(-1, 1, dtype=jnp.int32)[None, :]
    mi = MaskInfo(causal=True, q_positions=ppos, kv_len=pos + 1)
    assert da.decode_supported(q.shape, k.shape, mi)
    got = da.decode_attention(q, k, v, da.effective_lens(mi, B, 2), 1.0 / D**0.5)
    want = _oracle(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_rejects_oversized_sq():
    rng = np.random.default_rng(21)
    q, k, v = _setup(rng)
    q9 = jnp.broadcast_to(q, (2, da.MAX_SQ + 1, 8, 128))
    mi = MaskInfo(causal=True, q_positions=jnp.zeros((2, da.MAX_SQ + 1), jnp.int32),
                  kv_len=jnp.asarray([9, 9], jnp.int32))
    assert not da.decode_supported(q9.shape, k.shape, mi)


def test_model_multi_query_decode_routes_through_kernel():
    """A verify-pass-shaped forward (Sq=3, per-row positions) under attn_impl='auto'
    (kernel, interpret) must match attn_impl='xla' on identical params/cache."""
    from llama_x_tpu.models import llama
    from llama_x_tpu.ops.attention import MaskInfo as MI

    config = llama.tiny_config(
        embed_dim=256, num_layers=2, head_dim=128, num_heads=2, num_kv_heads=1,
        intermediate_dim=512, vocab_size=512, max_seq_len=256, attn_impl="auto",
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    B = 2
    prompt = jnp.asarray(rng.integers(1, 512, (B, 50)), jnp.int32)
    tok = jnp.asarray(rng.integers(1, 512, (B, 3)), jnp.int32)
    pos = jnp.asarray([50, 31], jnp.int32)  # desynchronized rows (speculative shape)

    def run(cfg):
        cache = llama.init_kv_cache(cfg, B, dtype=jnp.float32)
        x = jnp.take(params["tok_embeddings"]["weight"], prompt, axis=0)
        _, cache = llama.trunk(
            params, cfg, x, MI(causal=True), cache,
            input_pos=jnp.arange(50, dtype=jnp.int32), prefill=True,
        )
        qpos = pos[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]
        mi = MI(causal=True, q_positions=qpos, kv_len=pos + 3)
        xt = jnp.take(params["tok_embeddings"]["weight"], tok, axis=0)
        h, _ = llama.trunk(params, cfg, xt, mi, cache, input_pos=qpos)
        return h

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
