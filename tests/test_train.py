"""Training layer tests: LR schedule breakpoints, optimizer registry, quantized-state
AdamW vs optax AdamW, end-to-end train step (loss decreases), grad accumulation
equivalence, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
from llama_x_tpu.models import llama
from llama_x_tpu.train.optim import adamw_quantized, get_optimizer, trapezoid_schedule
from llama_x_tpu.train.trainer import full_params, init_train_state, make_train_step
from llama_x_tpu.utils.tree import named_leaves


def test_trapezoid_schedule_breakpoints():
    """≡ LRScheduler math (train_utils.py:51-58) at the breakpoints, minus the
    post-decay return-to-full-lr quirk."""
    s = trapezoid_schedule(1e-3, 100, warmup=0.1, decay=0.2)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(5)), 5e-4)
    np.testing.assert_allclose(float(s(10)), 1e-3)
    np.testing.assert_allclose(float(s(50)), 1e-3)
    np.testing.assert_allclose(float(s(79)), 1e-3)
    np.testing.assert_allclose(float(s(90)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(s(120)), 0.0, atol=1e-9)  # fixed quirk


def test_quantized_adamw_tracks_adamw():
    """int8-state AdamW should follow fp32 AdamW closely on a quadratic problem."""
    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, (64, 64))
    target = jax.random.normal(jax.random.PRNGKey(1), (64, 64))

    def loss(w):
        return jnp.mean((w - target) ** 2)

    def run(tx, steps=50):
        w = w0
        state = tx.init(w)
        for _ in range(steps):
            g = jax.grad(loss)(w)
            updates, state = tx.update(g, state, w)
            w = optax.apply_updates(w, updates)
        return float(loss(w))

    l_fp = run(optax.adamw(1e-2))
    l_q = run(adamw_quantized(1e-2))
    assert abs(l_fp - l_q) / max(l_fp, 1e-9) < 0.2, (l_fp, l_q)


def test_quantized_state_roundtrip_4bit():
    """4-bit nibble packing: quantize→dequantize is monotone-ish and bounded."""
    from llama_x_tpu.train.optim import _dequantize_state, _quantize_state

    x = jax.random.normal(jax.random.PRNGKey(3), (512,)) * 0.01
    for bits in (8, 4):
        q, s = _quantize_state(x, bits=bits)
        y = _dequantize_state(q, s, x.shape, bits=bits)
        absmax = float(jnp.max(jnp.abs(x)))
        tol = absmax * (0.02 if bits == 8 else 0.2)
        assert float(jnp.max(jnp.abs(y - x))) < tol, bits
        if bits == 4:
            assert q.size == x.size // 2  # two nibbles per byte


def test_optimizer_registry():
    for name in ("AdamW", "AdamW8bit", "AdamW4bit"):
        tx = get_optimizer(name, 1e-3, weight_decay=0.01, clip_grad_norm=1.0)
        p = {"w": jnp.ones((8, 8))}
        state = tx.init(p)
        updates, _ = tx.update({"w": jnp.ones((8, 8))}, state, p)
        assert jnp.all(jnp.isfinite(updates["w"]))


def _batchify(rng, config, accum, mb, S):
    tokens = rng.integers(0, config.vocab_size, (accum, mb, S)).astype(np.int32)
    labels = np.roll(tokens, -1, axis=-1).astype(np.int32)
    labels[..., -1] = -100
    return {"tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels)}


def _loss_fn(config):
    def loss_fn(params, mb):
        loss = llama.forward(params, config, mb["tokens"], labels=mb["labels"])
        return loss, jnp.sum(mb["labels"] != -100)

    return loss_fn


def test_train_step_loss_decreases():
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mask = trainable_mask(params)
    tx = get_optimizer("AdamW", 1e-3)
    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(_loss_fn(config), tx))

    rng = np.random.default_rng(0)
    batch = _batchify(rng, config, 1, 4, 32)  # same batch each step → loss must fall
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state["step"]) == 10
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(metrics["n_tokens"]) == 4 * 31


def test_grad_accumulation_equivalence():
    """N-microbatch accumulation ≡ one big batch (same total examples, mean loss)."""
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mask = trainable_mask(params)
    tx = optax.sgd(1e-2)
    step = jax.jit(make_train_step(_loss_fn(config), tx))

    rng = np.random.default_rng(1)
    big = _batchify(rng, config, 1, 8, 16)
    split = {k: v.reshape(4, 2, *v.shape[2:]) for k, v in big.items()}

    s1 = init_train_state(params, mask, tx)
    s1, m1 = step(s1, big)
    s2 = init_train_state(params, mask, tx)
    s2, m2 = step(s2, split)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for (n1, a), (n2, b) in zip(named_leaves(s1["trainable"]), named_leaves(s2["trainable"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=n1)


def test_frozen_params_unchanged_lora_step():
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", jax.random.PRNGKey(1), dtype=jnp.float32))
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm"))
    tx = get_optimizer("AdamW", 1e-2)
    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(_loss_fn(config), tx))

    batch = _batchify(np.random.default_rng(2), config, 2, 2, 16)
    before = {n: np.asarray(v).copy() for n, v in named_leaves(full_params(state))}
    for _ in range(3):
        state, _ = step(state, batch)
    after = dict(named_leaves(full_params(state)))

    for name, val in before.items():
        now = np.asarray(after[name])
        if "lora_a" in name or "lora_b" in name or "norm/scale" in name.split("/", 1)[-1]:
            continue  # trainable things may move
        if "kernel" in name or "weight" in name or name == "norm/scale":
            np.testing.assert_array_equal(val, now, err_msg=f"{name} should be frozen")


def test_skip_nonfinite_guard():
    """A NaN-producing batch must leave params and optimizer state untouched."""
    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mask = trainable_mask(params)
    tx = get_optimizer("AdamW", 1e-2)
    state = init_train_state(params, mask, tx)

    def nan_loss_fn(p, mb):
        loss = llama.forward(p, config, mb["tokens"], labels=mb["labels"])
        # multiplicative NaN when the sentinel appears so grads (not just the loss)
        # go non-finite
        scale = jnp.where(jnp.any(mb["labels"] == -12345), jnp.float32(jnp.nan), 1.0)
        return loss * scale, jnp.sum(mb["labels"] != -100)

    step = jax.jit(make_train_step(nan_loss_fn, tx, skip_nonfinite=True))
    rng = np.random.default_rng(0)
    batch = _batchify(rng, config, 1, 2, 16)

    before = {n: np.asarray(v).copy() for n, v in named_leaves(state["trainable"])}
    bad_batch = dict(batch, labels=batch["labels"].at[..., 0].set(-12345))
    state, metrics = step(state, bad_batch)
    assert float(metrics["skipped"]) == 1.0
    for n, v in named_leaves(state["trainable"]):
        np.testing.assert_array_equal(np.asarray(v), before[n], err_msg=n)

    # a good batch still updates
    state, metrics = step(state, batch)
    assert float(metrics["skipped"]) == 0.0
    changed = any(not np.array_equal(np.asarray(v), before[n]) for n, v in named_leaves(state["trainable"]))
    assert changed
