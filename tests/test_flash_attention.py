"""Pallas flash attention vs the dense XLA oracle (SURVEY.md §4 'Kernel' layer).

Runs the kernels in Pallas interpreter mode so the tests execute on CPU; the same
comparisons are run on real TPU hardware by the verify flows. Tolerances are loose-ish
because the oracle materializes full [S, S] logits while the kernel uses online softmax
(different summation orders), and MXU matmuls inside the kernel may use bf16 passes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.ops import flash_attention as fa
from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention


@pytest.fixture(autouse=True)
def _interpret():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _qkv(rng, B=2, S=256, Hq=4, Hkv=2, D=128):
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.5)
    return mk((B, S, Hq, D)), mk((B, S, Hkv, D)), mk((B, S, Hkv, D))


def _cases(rng, B, S):
    segs = jnp.asarray(np.sort(rng.integers(1, 5, (B, S)), axis=1).astype(np.int32))
    prefix = jnp.asarray(rng.integers(1, S // 2, (B,)).astype(np.int32))
    return {
        "causal": MaskInfo(causal=True),
        "noncausal": MaskInfo(causal=False),
        "doc": MaskInfo(causal=True, segment_ids=segs),
        "prefix": MaskInfo(causal=True, prefix_len=prefix),
        "doc+prefix": MaskInfo(causal=True, segment_ids=segs, prefix_len=prefix),
    }


@pytest.mark.parametrize("case", ["causal", "noncausal", "doc", "prefix", "doc+prefix"])
def test_flash_forward_matches_oracle(rng, case):
    q, k, v = _qkv(rng)
    mi = _cases(rng, q.shape[0], q.shape[1])[case]
    out = fa.flash_attention(q, k, v, mi)
    ref = dot_product_attention(q, k, v, mi)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-2)


@pytest.mark.parametrize("case", ["causal", "doc", "doc+prefix"])
def test_flash_grads_match_oracle(rng, case):
    q, k, v = _qkv(rng, S=256)
    mi = _cases(rng, q.shape[0], q.shape[1])[case]

    g1 = jax.grad(lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-2, (case, n, err)


def test_flash_gqa_grouping(rng):
    """8 query heads over 2 kv heads — group indexing must match repeat-based oracle."""
    q, k, v = _qkv(rng, Hq=8, Hkv=2, S=128)
    mi = MaskInfo(causal=True)
    out = fa.flash_attention(q, k, v, mi)
    ref = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-2)


def test_flash_wide_gqa_row_cap(rng):
    """group=16 (MQA-adjacent) must shrink bq so group*bq <= 1024 (the scoped-VMEM
    cap) and still match the oracle — incl. grads through the fused backward."""
    assert fa._pick_bq(128, 512, 16) == 64
    assert fa._pick_bq(128, 512, 32) == 32
    q, k, v = _qkv(rng, B=1, Hq=16, Hkv=1, S=128)
    mi = MaskInfo(causal=True)
    out = fa.flash_attention(q, k, v, mi)
    ref = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-2)
    g1 = jax.grad(lambda q: jnp.sum(fa.flash_attention(q, k, v, mi).astype(jnp.float32) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(dot_product_attention(q, k, v, mi).astype(jnp.float32) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-2, rtol=5e-2)


def test_flash_fallback_on_unaligned():
    """Non-128-multiple seq len must route to the XLA path, not crash."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 100, 2, 64)).astype(np.float32))
    out = fa.flash_attention(q, q, q, MaskInfo(causal=True))
    assert out.shape == q.shape
