"""Ulysses sequence parallelism (all-to-all head-scatter, parallel/ulysses.py)
exactness vs dense attention on the 8-device CPU sim — the CP family's second member
(SURVEY.md §2.3 'Ulysses-style head-scatter' behind the same MaskInfo interface as
ring attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention
from llama_x_tpu.parallel.ulysses import _kv_repeat, ulysses_attention, ulysses_supported

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 sim devices")


def _mesh_cp(n=8):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("cp",))


def _qkv(rng, B=2, S=128, Hq=8, Hkv=2, D=16):
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.5)
    return mk((B, S, Hq, D)), mk((B, S, Hkv, D)), mk((B, S, Hkv, D))


def _cases(rng, B, S):
    segs = jnp.asarray(np.sort(rng.integers(1, 4, (B, S)), axis=1).astype(np.int32))
    prefix = jnp.asarray(rng.integers(1, S // 2, (B,)).astype(np.int32))
    return {
        "causal": MaskInfo(causal=True),
        "noncausal": MaskInfo(causal=False),
        "doc": MaskInfo(causal=True, segment_ids=segs),
        "prefix": MaskInfo(causal=True, prefix_len=prefix),
        "doc+prefix": MaskInfo(causal=True, segment_ids=segs, prefix_len=prefix),
    }


def test_kv_repeat_geometry():
    # Hkv >= n and divisible: no replication needed
    assert _kv_repeat(8, 8, 4) == 1
    assert _kv_repeat(8, 4, 4) == 1
    # GQA with Hkv < n: replicate to lcm(Hkv, n)
    assert _kv_repeat(8, 2, 4) == 2   # 2 kv heads -> 4
    assert _kv_repeat(32, 4, 8) == 2  # 4 kv heads -> 8
    assert _kv_repeat(16, 2, 8) == 4  # 2 kv heads -> 8
    # impossible: lcm(Hkv, n) does not divide Hq
    assert _kv_repeat(8, 3, 4) is None
    assert _kv_repeat(4, 1, 8) is None  # 8 repeated kv heads > 4 q heads


def test_ulysses_supported_predicate():
    mi = MaskInfo(causal=True)
    assert ulysses_supported(128, 8, 2, 8, mi)
    assert not ulysses_supported(129, 8, 2, 8, mi)  # seq not divisible
    assert not ulysses_supported(128, 6, 2, 8, mi)  # heads not divisible
    assert not ulysses_supported(128, 8, 2, 8, MaskInfo(causal=True, kv_len=jnp.asarray([4])))


@pytest.mark.parametrize("case", ["causal", "noncausal", "doc", "prefix", "doc+prefix"])
def test_ulysses_matches_dense(rng, case):
    mesh = _mesh_cp()
    q, k, v = _qkv(rng)
    mi = _cases(rng, q.shape[0], q.shape[1])[case]
    got = ulysses_attention(q, k, v, mesh, mi)
    want = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4, err_msg=case)


def test_ulysses_no_kv_replication_path(rng):
    """Hkv == n: the g == 1 path (no jnp.repeat) must also be exact."""
    mesh = _mesh_cp()
    q, k, v = _qkv(rng, Hq=16, Hkv=8)
    mi = MaskInfo(causal=True)
    got = ulysses_attention(q, k, v, mesh, mi)
    want = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_ulysses_grads_match_dense(rng):
    mesh = _mesh_cp()
    q, k, v = _qkv(rng, S=64)
    seg = jnp.asarray(np.sort(np.random.default_rng(1).integers(1, 3, (2, 64)), axis=1).astype(np.int32))
    mi = MaskInfo(causal=True, segment_ids=seg)

    g1 = jax.grad(lambda q, k, v: jnp.sum(ulysses_attention(q, k, v, mesh, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=n)


def test_model_ulysses_attention_matches_xla(rng):
    """Full tiny-Llama forward with attn_impl='ulysses' over cp=8 ≡ the XLA attention."""
    from llama_x_tpu.models import llama
    from llama_x_tpu.parallel import use_mesh

    config = llama.tiny_config(max_seq_len=128, num_heads=8, num_kv_heads=2, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 128)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (2, 128)), jnp.int32)

    loss_xla = llama.forward(params, config, tokens, labels=labels)
    with use_mesh(_mesh_cp()):
        loss_uly = llama.forward(params, config.replace(attn_impl="ulysses"), tokens, labels=labels)
    np.testing.assert_allclose(float(loss_xla), float(loss_uly), rtol=2e-5)


def test_ulysses_head_contract(rng):
    """Heads not divisible by the cp axis must assert, not silently mis-scatter."""
    mesh = _mesh_cp()
    q, k, v = _qkv(rng, Hq=4, Hkv=2)  # 4 heads over cp=8
    with pytest.raises(AssertionError):
        ulysses_attention(q, k, v, mesh, MaskInfo(causal=True))


# ---------------------------------------------------------------------------
# flash local attention (Pallas kernel in interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.fixture
def interpret_flash():
    from llama_x_tpu.ops import flash_attention as fa

    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


@pytest.mark.parametrize("case", ["causal", "doc", "prefix", "doc+prefix"])
def test_ulysses_flash_matches_dense(rng, interpret_flash, case):
    """Head-scatter + local Pallas flash kernel ≡ dense attention."""
    mesh = _mesh_cp(2)
    q, k, v = _qkv(rng, B=1, S=256, Hq=4, Hkv=2, D=64)
    mi = _cases(rng, q.shape[0], q.shape[1])[case]
    got = ulysses_attention(q, k, v, mesh, mi, impl="flash")
    want = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4, err_msg=case)


def test_ulysses_flash_grads_match_dense(rng, interpret_flash):
    mesh = _mesh_cp(2)
    q, k, v = _qkv(rng, B=1, S=256, Hq=4, Hkv=2, D=64)
    prefix = jnp.asarray([130], jnp.int32)  # crosses the shard boundary
    mi = MaskInfo(causal=True, prefix_len=prefix)
    got, vjp = jax.vjp(lambda q, k, v: ulysses_attention(q, k, v, mesh, mi, impl="flash"), q, k, v)
    want, vjp_ref = jax.vjp(lambda q, k, v: dot_product_attention(q, k, v, mi), q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
    ct = jnp.asarray(np.random.default_rng(3).standard_normal(got.shape).astype(np.float32))
    for a, b, n in zip(vjp(ct), vjp_ref(ct), "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=n)
