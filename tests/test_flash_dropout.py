"""In-kernel attention dropout on the flash path (VERDICT r1 'What's missing #3').

The keep-mask is a counter-based hash of (seed, block coords) — pure jnp — so these
tests rebuild the EXACT mask outside the kernel and check the kernel fwd AND bwd
against a dense reference using that mask. Parametrized over head_dim (64 and 128)
so both swept block geometries run; all head dims take the head-major kernels
(per-kv-head seeding, rows=GROUP*BQ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.models import llama
from llama_x_tpu.ops import flash_attention as fa
from llama_x_tpu.ops.attention import MaskInfo


@pytest.fixture(autouse=True)
def interpret():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


B, Hq, Hkv, S = 1, 4, 2, 256
GROUP = Hq // Hkv
BQ = BK = 128  # forces a 2x2 block grid so per-block seeding is exercised
RATE = 0.3

DIMS = pytest.mark.parametrize("d", [64, 128], ids=["d64", "d128"])


def _qkv(rng, d):
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.5)
    return mk((B, S, Hq, d)), mk((B, S, Hkv, d)), mk((B, S, Hkv, d))


def _oracle_keep(seed, d):
    """[B, Hq, S, S] keep-scale mask rebuilt from the kernel's hash."""
    mask = np.zeros((B, Hq, S, S), np.float32)
    for b in range(B):
        for hq in range(Hq):
            for i in range(S // BQ):
                for j in range(S // BK):
                    # the GQA group rides one block (rows = GROUP*BQ, head-major),
                    # seeded on the kv head
                    g, h = hq % GROUP, hq // GROUP
                    full = np.asarray(
                        fa._keep_for(jnp.uint32(seed), RATE, GROUP * BQ, BK, b, h, i, j)
                    ).reshape(GROUP, BQ, BK)
                    mask[b, hq, i * BQ : (i + 1) * BQ, j * BK : (j + 1) * BK] = full[g]
    return jnp.asarray(mask)


def _dense_dropout_attention(q, k, v, keep, d):
    """Reference: P = softmax(causal logits); out = (P * keep) @ V."""
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Hq, S, D]
    # repeat_interleave semantics must match the kernels' GQA grouping:
    # head hq -> kv head hq // group
    kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)[:, :, None].repeat(GROUP, 2).reshape(B, Hq, S, d)
    vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)[:, :, None].repeat(GROUP, 2).reshape(B, Hq, S, d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / d**0.5
    causal = jnp.tril(jnp.ones((S, S), bool))
    logits = jnp.where(causal[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs * keep, vf)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _flash(q, k, v, rng_key):
    return fa.flash_attention(
        q, k, v, MaskInfo(causal=True), block_q=BQ, block_kv=BK,
        dropout_rate=RATE, dropout_rng=rng_key,
    )


@DIMS
def test_dropout_fwd_matches_masked_dense(rng, d):
    q, k, v = _qkv(rng, d)
    key = jax.random.PRNGKey(7)
    got = _flash(q, k, v, key)
    seed = int(jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max, jnp.int32)[0, 0])
    want = _dense_dropout_attention(q, k, v, _oracle_keep(seed, d), d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@DIMS
def test_dropout_bwd_matches_masked_dense(rng, d):
    q, k, v = _qkv(rng, d)
    key = jax.random.PRNGKey(3)
    seed = int(jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max, jnp.int32)[0, 0])
    keep = _oracle_keep(seed, d)
    ct = jnp.asarray(np.random.default_rng(1).standard_normal((B, S, Hq, d)).astype(np.float32))

    g1 = jax.grad(lambda q, k, v: jnp.sum(_flash(q, k, v, key) * ct), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(_dense_dropout_attention(q, k, v, keep, d) * ct), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=n)


def test_dropout_deterministic_and_rate(rng):
    q, k, v = _qkv(rng, 128)
    key = jax.random.PRNGKey(0)
    a = _flash(q, k, v, key)
    b = _flash(q, k, v, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = _flash(q, k, v, jax.random.PRNGKey(1))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-6  # different seed, different mask
    # empirical drop rate of the hash mask ~ RATE
    seed = 12345
    keep = np.asarray(fa._keep_for(jnp.uint32(seed), RATE, 512, 512, 0, 0, 0, 0))
    assert abs((keep == 0).mean() - RATE) < 0.01


def test_model_trains_with_flash_dropout(rng):
    """attn_dropout > 0 with attn_impl='flash' stays on the kernel path and trains
    (finite loss, nonzero grads) — the reference's SDPA-dropout capability row."""
    config = llama.tiny_config(
        embed_dim=128, num_layers=2, head_dim=64, num_heads=2, num_kv_heads=1,
        intermediate_dim=256, vocab_size=128, max_seq_len=128,
        attn_impl="flash", attn_dropout=0.1,
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 128)), jnp.int32)

    def loss_fn(p, key):
        return llama.forward(p, config, tokens, labels=tokens, dropout_rng=key)

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32)**2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0
    # different dropout key -> different loss (dropout is live on the flash path)
    loss2 = loss_fn(params, jax.random.PRNGKey(6))
    assert abs(float(loss) - float(loss2)) > 1e-7
