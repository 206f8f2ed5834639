"""Ring attention (context parallelism) exactness vs dense attention on the 8-device
CPU sim (SURVEY.md §4 'Distributed without a cluster': ring-attention exactness vs dense
attention at small sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention
from llama_x_tpu.parallel import make_mesh
from llama_x_tpu.parallel.context import context_parallel_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 sim devices")


def _mesh_cp(n=8):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("cp",))


def _qkv(rng, B=2, S=128, Hq=4, Hkv=2, D=16):
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


@pytest.mark.parametrize("case", ["causal", "noncausal", "doc", "prefix", "doc+prefix"])
def test_ring_matches_dense(rng, case):
    mesh = _mesh_cp()
    q, k, v = _qkv(rng)
    mi = _cases(rng, q.shape[0], q.shape[1])[case]
    got = context_parallel_attention(q, k, v, mesh, mi)
    want = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4, err_msg=case)


def test_ring_grads_match_dense(rng):
    mesh = _mesh_cp()
    q, k, v = _qkv(rng, S=64)
    mi = MaskInfo(causal=True, segment_ids=jnp.asarray(np.sort(np.random.default_rng(1).integers(1, 3, (2, 64)), axis=1).astype(np.int32)))

    g1 = jax.grad(lambda q, k, v: jnp.sum(context_parallel_attention(q, k, v, mesh, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=n)


def test_model_ring_attention_matches_xla(rng):
    """Full tiny-Llama forward with attn_impl='ring' over cp=8 ≡ the XLA attention."""
    import jax.numpy as jnp

    from llama_x_tpu.models import llama
    from llama_x_tpu.parallel import use_mesh

    config = llama.tiny_config(max_seq_len=128, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 128)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (2, 128)), jnp.int32)

    loss_xla = llama.forward(params, config, tokens, labels=labels)
    with use_mesh(_mesh_cp()):
        loss_ring = llama.forward(params, config.replace(attn_impl="ring"), tokens, labels=labels)
    np.testing.assert_allclose(float(loss_xla), float(loss_ring), rtol=2e-5)


def test_ring_memory_shape_contract(rng):
    """S not divisible by the cp axis must assert, not silently mis-shard."""
    mesh = _mesh_cp()
    q, k, v = _qkv(rng, S=60)
    with pytest.raises(AssertionError):
        context_parallel_attention(q, k, v, mesh, MaskInfo(causal=True))


# ---------------------------------------------------------------------------
# flash-blocked ring (Pallas kernel per ring block, interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.fixture
def interpret_flash():
    from llama_x_tpu.ops import flash_attention as fa

    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _qkv_flash(rng, B=1, S=256, Hq=4, Hkv=2, D=64):
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.5)
    return mk((B, S, Hq, D)), mk((B, S, Hkv, D)), mk((B, S, Hkv, D))


@pytest.mark.parametrize("case", ["causal", "doc", "prefix", "doc+prefix"])
def test_ring_flash_matches_dense(rng, interpret_flash, case, monkeypatch):
    """Kernel-blocked ring ≡ dense attention, and the dense per-block path
    (_block_attention, the O(S_local^2) materializer) is never invoked."""
    from llama_x_tpu.ops import ring_attention as ra

    def boom(*a, **k):
        raise AssertionError("dense _block_attention used on the flash ring path")

    monkeypatch.setattr(ra, "_block_attention", boom)

    mesh = _mesh_cp(2)
    q, k, v = _qkv_flash(rng)
    mi = _cases(rng, q.shape[0], q.shape[1])[case]
    got = context_parallel_attention(q, k, v, mesh, mi, impl="flash")
    want = dot_product_attention(q, k, v, mi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4, err_msg=case)


def test_ring_flash_grads_match_dense(rng, interpret_flash):
    from llama_x_tpu.ops import ring_attention as ra

    mesh = _mesh_cp(2)
    q, k, v = _qkv_flash(rng)
    seg = jnp.asarray(np.sort(np.random.default_rng(1).integers(1, 3, (1, 256)), axis=1).astype(np.int32))
    mi = MaskInfo(causal=True, segment_ids=seg)

    g1 = jax.grad(
        lambda q, k, v: jnp.sum(context_parallel_attention(q, k, v, mesh, mi, impl="flash") ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, mi) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=n)


def test_ring_flash_gqa_prefix_grads(rng, interpret_flash):
    """GQA (group 2) + prefix-LM through the kernel ring, fwd + bwd."""
    mesh = _mesh_cp(2)
    q, k, v = _qkv_flash(rng, B=2)
    prefix = jnp.asarray([64, 130], jnp.int32)  # second prefix crosses the shard boundary
    mi = MaskInfo(causal=True, prefix_len=prefix)
    got, vjp = jax.vjp(lambda q, k, v: context_parallel_attention(q, k, v, mesh, mi, impl="flash"), q, k, v)
    want, vjp_ref = jax.vjp(lambda q, k, v: dot_product_attention(q, k, v, mi), q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
    ct = jnp.asarray(np.random.default_rng(3).standard_normal(got.shape).astype(np.float32))
    for a, b, n in zip(vjp(ct), vjp_ref(ct), "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=n)
