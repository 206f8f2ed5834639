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


def test_all_true_predicate_safe_and_useful(rng):
    """_all_true (the whole-block mask-skip predicate) is a conservative
    under-approximation: it must NEVER be True when the _build_mask tile has a
    masked element (a false positive silently skips masking = wrong attention),
    but it may miss all-True tiles (e.g. a causal∪prefix union that covers the
    tile without either term being uniform — only a lost skip). _needed must be
    True whenever ANY element is unmasked (a false negative drops the block)."""
    bq = bk = 64
    hits = 0
    for trial in range(300):
        causal = bool(rng.integers(2))
        has_seg = bool(rng.integers(2))
        has_prefix = bool(rng.integers(2))
        if not (causal or has_seg or has_prefix):
            continue  # kernel never consults the predicates without mask sources
        q_start = int(rng.integers(0, 512))
        kv_start = int(rng.integers(0, 512))
        # segment ids sorted along the sequence like the packed pipeline produces
        qseg = jnp.asarray(np.sort(rng.integers(1, 4, (bq, 1))), jnp.int32) if has_seg else None
        kseg = jnp.asarray(np.sort(rng.integers(1, 4, (1, bk))), jnp.int32) if has_seg else None
        prefix = jnp.int32(rng.integers(0, 600)) if has_prefix else None

        mask = fa._build_mask(q_start, kv_start, bq, bk, causal=causal,
                              qseg=qseg, kseg=kseg, prefix=prefix)
        allt = fa._all_true(q_start, kv_start, bq, bk, causal=causal,
                            qseg=qseg, kseg=kseg, prefix=prefix)
        need = fa._needed(q_start, kv_start, bq, bk, causal=causal, prefix=prefix)

        m = np.asarray(mask) if mask is not None else np.ones((bq, bk), bool)
        if bool(allt):
            hits += 1
            assert bool(m.all()), (
                f"trial {trial}: _all_true=True but the mask has masked elements "
                f"(causal={causal} seg={has_seg} prefix={prefix} q0={q_start} kv0={kv_start})"
            )
        if need is not None and m.any():
            assert bool(need), (
                f"trial {trial}: _needed=False but the mask has unmasked elements "
                f"(causal={causal} prefix={prefix} q0={q_start} kv0={kv_start})"
            )
    assert hits > 20, f"predicate fired only {hits} times — skip path effectively dead"

    # targeted positives: the two block classes the 8B bench step skips masking on
    assert bool(fa._all_true(512, 0, bq, bk, causal=True, qseg=None, kseg=None, prefix=None))
    assert bool(fa._all_true(0, 0, bq, bk, causal=True, qseg=None, kseg=None,
                             prefix=jnp.int32(256)))
    # uniform-segment tile strictly below the diagonal
    u = jnp.ones((bq, 1), jnp.int32)
    assert bool(fa._all_true(512, 0, bq, bk, causal=True, qseg=u, kseg=u.T, prefix=None))


def test_attention_q8_flash_path_matches_oracle(rng):
    """attention_q8 (manual vjp, int8 residuals) through the REAL flash path
    (interpret mode): primal matches the rms_norm+oracle-attention+o_proj reference
    to kernel tolerance; grads match within int8-residual noise. Covers the
    flash_fwd_with_lse / flash_bwd_from_res plumbing incl. doc+prefix masks."""
    from llama_x_tpu.models import llama
    from llama_x_tpu.ops.norms import rms_norm

    B, S, Hq, Hkv, D = 2, 256, 4, 2, 64
    E = Hq * D
    config = llama.LlamaConfig(
        embed_dim=E, num_layers=1, head_dim=D, num_heads=Hq, num_kv_heads=Hkv,
        intermediate_dim=2 * E, max_seq_len=S, vocab_size=64, attn_impl="flash",
    )
    mk = lambda *shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * (1.0 / np.sqrt(shape[0])))
    p = {
        "wq": {"kernel": mk(E, Hq * D)},
        "wk": {"kernel": mk(E, Hkv * D)},
        "wv": {"kernel": mk(E, Hkv * D)},
        "wo": {"kernel": mk(Hq * D, E)},
    }
    norm_scale = jnp.ones((E,), jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, S, E)).astype(np.float32) * 0.5)
    rope = llama.build_rope(S, D, 10_000.0, False)
    segs = jnp.asarray(np.sort(rng.integers(1, 4, (B, S)), axis=1).astype(np.int32))
    prefix = jnp.asarray(rng.integers(8, S // 4, (B,)).astype(np.int32))
    mi = MaskInfo(causal=True, segment_ids=segs, prefix_len=prefix)

    def ref(p, h):
        from llama_x_tpu.ops.linear import apply_linear, apply_linear_grouped
        from llama_x_tpu.ops.rope import apply_rope

        x = rms_norm(h, norm_scale, config.norm_eps)
        q, k, v = apply_linear_grouped(x, (p["wq"], p["wk"], p["wv"]))
        q = apply_rope(q.reshape(B, S, Hq, D), rope)
        k = apply_rope(k.reshape(B, S, Hkv, D), rope)
        out = dot_product_attention(q, k, v.reshape(B, S, Hkv, D), mi)
        return apply_linear(out.reshape(B, S, Hq * D), p["wo"])

    probe = jnp.asarray(rng.standard_normal((B, S, E)).astype(np.float32))

    def scalar(fn):
        return lambda p, h: jnp.sum(fn(p, h) * probe)

    o_q8 = llama.attention_q8(config, p, norm_scale, h, rope, mi)
    o_ref = ref(p, h)
    np.testing.assert_allclose(np.asarray(o_q8), np.asarray(o_ref), rtol=2e-2, atol=2e-3)

    g_q8 = jax.grad(scalar(lambda p, h: llama.attention_q8(config, p, norm_scale, h, rope, mi)), argnums=(0, 1))(p, h)
    g_ref = jax.grad(scalar(ref), argnums=(0, 1))(p, h)
    flat_q8, flat_ref = jax.tree.leaves(g_q8), jax.tree.leaves(g_ref)
    assert len(flat_q8) == len(flat_ref)
    for a, b in zip(flat_ref, flat_q8):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b / denom, a / denom, atol=0.04)
