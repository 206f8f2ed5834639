"""Checkpoint round-trip: save → restore is exact (incl. int8 leaves and opt state),
latest-pointer resolution, resume continues the step counter (the --resume contract,
train_librispeech.py:200-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llama_x_tpu.adapters import apply_linear_adapter, quantize_linear, trainable_mask
from llama_x_tpu.models import llama
from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from llama_x_tpu.train.trainer import init_train_state, make_train_step
from llama_x_tpu.utils.tree import named_leaves


def test_roundtrip_exact(tmp_path):
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    params = dict(params, layers=quantize_linear(params["layers"], "int8"))
    params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", jax.random.PRNGKey(1)))
    tx = optax.adamw(1e-3)
    state = init_train_state(params, trainable_mask(params), tx)

    save_checkpoint(tmp_path, state, step=3)
    path = latest_checkpoint(tmp_path)
    assert path is not None and path.name == "step_00000003"

    restored = restore_checkpoint(path, jax.tree.map(lambda x: x, state))
    for (n, a), (_, b) in zip(named_leaves(state), named_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=n)
        assert np.asarray(a).dtype == np.asarray(b).dtype, n


def test_resume_continues_training(tmp_path):
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    tx = optax.adamw(1e-3)

    def loss_fn(p, mb):
        return llama.forward(p, config, mb["tokens"], labels=mb["labels"]), jnp.sum(mb["labels"] != -100)

    step = jax.jit(make_train_step(loss_fn, tx))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, config.vocab_size, (1, 2, 16)).astype(np.int32)
    labels = np.roll(tokens, -1, axis=-1).astype(np.int32)
    batch = {"tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels)}

    state = init_train_state(params, trainable_mask(params), tx)
    for _ in range(2):
        state, _ = step(state, batch)
    save_checkpoint(tmp_path, state, step=2)

    # continue original
    state_a, _ = step(state, batch)
    # restore and continue
    restored = restore_checkpoint(latest_checkpoint(tmp_path), jax.tree.map(lambda x: x, state))
    assert int(restored["step"]) == 2
    state_b, _ = step(restored, batch)

    for (n, a), (_, b) in zip(named_leaves(state_a["trainable"]), named_leaves(state_b["trainable"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=n)
