"""Distributed-without-a-cluster tests (SURVEY.md §4): 8 virtual CPU devices.

- mesh construction and axis inference
- param sharding rules produce valid placements (every leaf lands on the mesh)
- DP grad equivalence: 8-device data-parallel step ≡ single-device big-batch step
- FSDP+TP: sharded train step runs and matches the unsharded step numerically
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llama_x_tpu.models import llama
from llama_x_tpu.adapters import trainable_mask
from llama_x_tpu.parallel import batch_sharding, make_mesh, param_specs, shard_params
from llama_x_tpu.train.trainer import init_train_state, make_train_step
from llama_x_tpu.utils.tree import named_leaves

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 sim devices")


def _cfg():
    return llama.tiny_config(
        embed_dim=64, num_layers=2, head_dim=16, num_heads=4, num_kv_heads=2,
        intermediate_dim=128, vocab_size=256, max_seq_len=64,
    )


def _loss_fn(config):
    def loss_fn(params, mb):
        loss = llama.forward(params, config, mb["tokens"], labels=mb["labels"])
        return loss, jnp.sum(mb["labels"] != -100)

    return loss_fn


def _batch(rng, config, accum, mb, S=32):
    tokens = rng.integers(0, config.vocab_size, (accum, mb, S)).astype(np.int32)
    labels = np.roll(tokens, -1, axis=-1).astype(np.int32)
    labels[..., -1] = -100
    return {"tokens": tokens, "labels": labels}


def test_make_mesh_inference():
    m = make_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = make_mesh(dp=2, fsdp=2, tp=2)
    assert m2.shape == {"dp": 2, "fsdp": 2, "pp": 1, "cp": 1, "tp": 2}
    m3 = make_mesh(dp=2, cp=2, tp=2)
    assert m3.shape == {"dp": 2, "fsdp": 1, "pp": 1, "cp": 2, "tp": 2}
    m4 = make_mesh(pp=4)
    assert m4.shape["pp"] == 4 and m4.shape["fsdp"] == 2
    with pytest.raises(AssertionError):
        make_mesh(dp=3, fsdp=1, tp=1)


def test_param_specs_cover_all_leaves():
    config = _cfg()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    specs = dict(named_leaves(param_specs(params)))
    assert specs["layers/attention/wq/kernel"] == P(None, "fsdp", "tp")
    assert specs["layers/attention/wo/kernel"] == P(None, "tp", "fsdp")
    assert specs["layers/feed_forward/w2/kernel"] == P(None, "tp", "fsdp")
    assert specs["tok_embeddings/weight"] == P("tp", "fsdp")
    assert specs["output/kernel"] == P("fsdp", "tp")
    assert specs["norm/scale"] == P()

    mesh = make_mesh(dp=1, fsdp=4, tp=2)
    sharded = shard_params(params, mesh)
    for name, leaf in named_leaves(sharded):
        assert leaf.sharding.mesh.shape == mesh.shape, name


def test_dp_step_equals_single_device_step():
    """The distributed correctness gate: 8-way DP ≡ big batch on 1 device."""
    config = _cfg()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mask = trainable_mask(params)
    tx = optax.sgd(1e-2)
    loss_fn = _loss_fn(config)
    rng = np.random.default_rng(0)
    batch_np = _batch(rng, config, 1, 16)

    # single device
    s1 = init_train_state(params, mask, tx)
    step1 = jax.jit(make_train_step(loss_fn, tx))
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    # 8-way DP
    mesh = make_mesh(dp=8, fsdp=1, tp=1)
    sp = shard_params(params, mesh)
    s2 = init_train_state(sp, mask, tx)
    bsh = batch_sharding(mesh)
    batch_dp = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch_np.items()}
    step2 = jax.jit(make_train_step(loss_fn, tx))
    s2, m2 = step2(s2, batch_dp)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for (n, a), (_, b) in zip(named_leaves(s1["trainable"]), named_leaves(s2["trainable"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=n)


def test_fsdp_tp_step_matches_unsharded():
    config = _cfg()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mask = trainable_mask(params)
    tx = optax.adamw(1e-3)
    loss_fn = _loss_fn(config)
    batch_np = _batch(np.random.default_rng(1), config, 2, 4)

    s1 = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(loss_fn, tx))
    s1, m1 = step(s1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sp = shard_params(params, mesh)
    s2 = init_train_state(sp, mask, tx)
    batch_sh = {k: jax.device_put(jnp.asarray(v), batch_sharding(mesh)) for k, v in batch_np.items()}
    s2, m2 = step(s2, batch_sh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # spot-check a tp-sharded and an fsdp-sharded weight after update
    for name in ("layers/attention/wq/kernel", "layers/feed_forward/w2/kernel", "output/kernel"):
        a = dict(named_leaves(s1["trainable"]))[name]
        b = dict(named_leaves(s2["trainable"]))[name]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name)
