"""Unit tests for core ops: rms_norm, cross-entropy (plain + fused-chunked), attention
masks (document/prefix truth tables), GQA attention vs torch SDPA, int8 quant round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention, make_attention_mask
from llama_x_tpu.ops.cross_entropy import cross_entropy_loss, fused_linear_cross_entropy
from llama_x_tpu.ops.int8 import int8_linear, quantize_int8_rowwise
from llama_x_tpu.ops.norms import rms_norm


def test_rms_norm_vs_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    scale = rng.standard_normal(16).astype(np.float32)
    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(scale)))
    theirs = TF.rms_norm(torch.tensor(x), (16,), torch.tensor(scale), eps=1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_cross_entropy_vs_torch_with_ignore():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (4, 7)).astype(np.int64)
    labels[0, :3] = -100
    labels[2] = -100
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(
        TF.cross_entropy(torch.tensor(logits).view(-1, 11), torch.tensor(labels).view(-1))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_fused_linear_ce_matches_plain_fwd_and_grads():
    rng = np.random.default_rng(2)
    N, D, V = 16, 8, 32
    hidden = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((D, V)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, V, (N,)))
    labels = labels.at[:3].set(-100)

    def plain(h, k):
        return cross_entropy_loss(h @ k, labels)

    def fused(h, k):
        return fused_linear_cross_entropy(h, k, labels, 4)

    l1, (gh1, gk1) = jax.value_and_grad(plain, argnums=(0, 1))(hidden, kernel)
    l2, (gh2, gk2) = jax.value_and_grad(fused, argnums=(0, 1))(hidden, kernel)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-4, atol=1e-4)


def test_fused_linear_ce_frozen_head():
    """kernel_grad=False (frozen LM head): identical loss and dH, zero dK — the
    backward skips the dK GEMM + fp32 [D, V] accumulator entirely."""
    rng = np.random.default_rng(3)
    N, D, V = 16, 8, 32
    hidden = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((D, V)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, V, (N,)))
    labels = labels.at[:3].set(-100)

    def fused(h, k, kernel_grad):
        return fused_linear_cross_entropy(h, k, labels, 4, kernel_grad)

    l1, (gh1, gk1) = jax.value_and_grad(fused, argnums=(0, 1))(hidden, kernel, True)
    l2, (gh2, gk2) = jax.value_and_grad(fused, argnums=(0, 1))(hidden, kernel, False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), rtol=1e-6, atol=1e-6)
    assert not np.any(np.asarray(gk2))
    assert np.any(np.asarray(gk1))


def test_fused_linear_ce_int8_head():
    """head_int8: loss and dH track the f32 path within int8-rounding tolerance
    (rowwise h / colwise K / rowwise scale-folded dlogits quantization)."""
    rng = np.random.default_rng(7)
    N, D, V = 64, 32, 128
    hidden = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((D, V)).astype(np.float32) * 0.05)
    labels = jnp.asarray(rng.integers(0, V, (N,)))
    labels = labels.at[:5].set(-100)

    def fused(h, head_int8):
        return fused_linear_cross_entropy(h, kernel, labels, 4, False, head_int8)

    l_ref, gh_ref = jax.value_and_grad(fused)(hidden, False)
    l_q, gh_q = jax.value_and_grad(fused)(hidden, True)
    np.testing.assert_allclose(float(l_q), float(l_ref), rtol=2e-2)
    # dH: compare in relative Frobenius norm — per-element tolerance is meaningless
    # for near-zero entries of a quantized gradient
    num = float(jnp.linalg.norm(gh_q.astype(jnp.float32) - gh_ref.astype(jnp.float32)))
    den = float(jnp.linalg.norm(gh_ref.astype(jnp.float32)))
    assert num / den < 0.05, (num, den)

    with np.testing.assert_raises(ValueError):
        fused_linear_cross_entropy(hidden, kernel, labels, 4, True, True)


def test_document_mask_truth_table():
    """Same-document AND causal (train_metamathqa.py:67-68 semantics)."""
    seg = jnp.asarray([[1, 1, 2, 2, 0]])
    mask = np.asarray(make_attention_mask(MaskInfo(causal=True, segment_ids=seg), 5, 5, 1))[0, 0]
    expected = np.array(
        [
            [1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [0, 0, 1, 0, 0],
            [0, 0, 1, 1, 0],
            [0, 0, 0, 0, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(mask, expected)


def test_prefix_lm_mask():
    """Positions < prefix_len attend bidirectionally; suffix is causal over everything."""
    mi = MaskInfo(causal=True, prefix_len=jnp.asarray([3]))
    mask = np.asarray(make_attention_mask(mi, 5, 5, 1))[0, 0]
    expected = np.array(
        [
            [1, 1, 1, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 1, 0],
            [1, 1, 1, 1, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(mask, expected)


def test_gqa_attention_vs_torch_sdpa():
    rng = np.random.default_rng(3)
    B, S, Hq, Hkv, D = 2, 8, 4, 2, 16
    q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)

    ours = np.asarray(
        dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), MaskInfo(causal=True))
    )
    theirs = TF.scaled_dot_product_attention(
        torch.tensor(q).transpose(1, 2),
        torch.tensor(k).transpose(1, 2),
        torch.tensor(v).transpose(1, 2),
        is_causal=True,
        enable_gqa=True,
    ).transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_int8_quant_roundtrip_error_bound():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    q, scale = quantize_int8_rowwise(jnp.asarray(w))
    assert q.dtype == jnp.int8
    deq = np.asarray(q).astype(np.float32) * np.asarray(scale)[:, None]
    # max quantization error is half a quantization step per row
    step = np.abs(w).max(axis=1) / 127
    assert np.all(np.abs(deq - w) <= step[:, None] * 0.5 + 1e-7)


def test_int8_linear_forward_and_backward():
    """Forward ≈ x @ dequant(W).T; backward: grad_x = (g*scale)@W_i8, no weight grad
    (subclasses/int8.py:106-130 semantics)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    int_data, scale = quantize_int8_rowwise(w)

    out = int8_linear(x, int_data, scale, False)
    expected = np.asarray(x) @ (np.asarray(int_data).astype(np.float32) * np.asarray(scale)[:, None]).T
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-3)

    g = jnp.ones((4, 32), jnp.float32)
    gx = jax.grad(lambda xx: jnp.sum(int8_linear(xx, int_data, scale, False)))(x)
    expected_gx = (np.asarray(g) * np.asarray(scale)[None, :]) @ np.asarray(int_data).astype(np.float32)
    np.testing.assert_allclose(np.asarray(gx), expected_gx, rtol=1e-4, atol=1e-5)

    # dynamic act quant path runs (XLA fallback on CPU) and is close to the float matmul
    out_dyn = int8_linear(x, int_data, scale, True)
    np.testing.assert_allclose(np.asarray(out_dyn), expected, rtol=0.05, atol=0.1)


def test_int8_linear_quantized_backward():
    """dynamic_int8_bwd: dgrad runs as q(g*scale) @ W_i8 * g_scale — must track the fp
    dgrad within rowwise int8 noise, be exact when g*scale rows are exactly
    representable, and still produce no weight grad."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((6, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    int_data, scale = quantize_int8_rowwise(w)

    def loss(xx, bwd):
        return jnp.sum(int8_linear(xx, int_data, scale, False, bwd) * cot)

    # random cotangent so the dgrad is non-trivial
    cot = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    gx_fp = jax.grad(loss)(x, False)
    gx_q = jax.grad(loss)(x, True)
    # rowwise int8 noise on g*scale: per-row error <= step/2, through a 32-length dot
    denom = np.abs(np.asarray(gx_fp)).max()
    assert np.abs(np.asarray(gx_q) - np.asarray(gx_fp)).max() <= 0.02 * denom

    # exactness when each row of g*scale is already an exact multiple of its step:
    # cot row = const/scale makes (g*scale) constant per row -> quantizes losslessly
    cot = jnp.asarray(1.0 / np.asarray(scale))[None, :] * jnp.ones((6, 32), jnp.float32)
    gx_fp = jax.grad(loss)(x, False)
    gx_q = jax.grad(loss)(x, True)
    np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_fp), rtol=2e-5, atol=2e-5)
