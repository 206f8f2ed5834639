"""Golden parity: tiny-config JAX Llama vs the independent PyTorch oracle
(BASELINE.json: 'logits matched to the PyTorch reference', CPU-runnable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llama_x_tpu.models import llama
from llama_x_tpu.utils.tree import named_leaves

from torch_oracle import oracle_forward


def _to_torch_weights(params):
    return {name: torch.tensor(np.asarray(leaf, dtype=np.float32)) for name, leaf in named_leaves(params)}


def _make(config=None, seed=0):
    config = config or llama.tiny_config()
    params = llama.init(jax.random.PRNGKey(seed), config, dtype=jnp.float32)
    return params, config


def test_logits_parity_fp32():
    params, config = _make()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, config.vocab_size, (2, 12)).astype(np.int32)

    ours = np.asarray(llama.forward(params, config, jnp.asarray(tokens)))
    theirs = oracle_forward(
        _to_torch_weights(params), dataclasses.asdict(config), torch.tensor(tokens.astype(np.int64))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_logits_parity_llama31_rope():
    config = llama.tiny_config(is_llama3_1=True, rope_base=500_000.0, head_dim=16)
    params, config = _make(config)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, config.vocab_size, (1, 16)).astype(np.int32)

    ours = np.asarray(llama.forward(params, config, jnp.asarray(tokens)))
    theirs = oracle_forward(
        _to_torch_weights(params), dataclasses.asdict(config), torch.tensor(tokens.astype(np.int64))
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_fused_loss_parity():
    params, config = _make()
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, config.vocab_size, (2, 12)).astype(np.int32)
    labels = rng.integers(0, config.vocab_size, (2, 12)).astype(np.int64)
    labels[:, :4] = -100

    ours = float(llama.forward(params, config, jnp.asarray(tokens), labels=jnp.asarray(labels)))
    theirs = float(
        oracle_forward(
            _to_torch_weights(params),
            dataclasses.asdict(config),
            torch.tensor(tokens.astype(np.int64)),
            labels=torch.tensor(labels),
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_fused_ce_chunks_path_matches():
    params, config = _make()
    config_fused = config.replace(fused_ce_chunks=4)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, config.vocab_size, (2, 8)).astype(np.int32)
    labels = rng.integers(0, config.vocab_size, (2, 8)).astype(np.int64)

    plain = float(llama.forward(params, config, jnp.asarray(tokens), labels=jnp.asarray(labels)))
    fused = float(llama.forward(params, config_fused, jnp.asarray(tokens), labels=jnp.asarray(labels)))
    np.testing.assert_allclose(plain, fused, rtol=1e-5)


def test_activation_checkpointing_same_loss_and_grads():
    params, config = _make()
    config_ckpt = config.replace(activation_checkpointing=True)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 8)).astype(np.int32))
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (2, 8)).astype(np.int64))

    def loss_fn(p, cfg):
        return llama.forward(p, cfg, tokens, labels=labels)

    l1, g1 = jax.value_and_grad(loss_fn)(params, config)
    l2, g2 = jax.value_and_grad(loss_fn)(params, config_ckpt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for (n1, a), (n2, b) in zip(named_leaves(g1), named_leaves(g2)):
        assert n1 == n2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=n1)


def test_decode_matches_full_forward():
    """Prefill+decode through the KV cache must reproduce the full causal forward
    (the design contract for generate; reference has the cache but no sampler)."""
    params, config = _make()
    rng = np.random.default_rng(5)
    B, S = 2, 10
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (B, S)).astype(np.int32))

    full_logits = llama.forward(params, config, tokens)

    cache = llama.init_kv_cache(config, B, dtype=jnp.float32)
    prefill = 6
    logits_p, cache = llama.forward(
        params,
        config,
        tokens[:, :prefill],
        kv_cache=cache,
        input_pos=jnp.arange(prefill),
        kv_len=jnp.full((B,), prefill),
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :prefill]), rtol=2e-4, atol=2e-4
    )

    for t in range(prefill, S):
        logits_t, cache = llama.forward(
            params,
            config,
            tokens[:, t : t + 1],
            kv_cache=cache,
            input_pos=jnp.array([t]),
            kv_len=jnp.full((B,), t + 1),
        )
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(full_logits[:, t]), rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("policy", ["flash_proj_q8", "flash_proj_q8s", "attn_q8", "attn_q8s"])
def test_q8_remat_forward_exact_and_grads_close(policy):
    """"flash_proj_q8" (int8-residual MLP outside the attention checkpoint region):
    forward must be bit-identical to the plain path (the primal computes from exact
    h1/h3); grads may differ only by the int8 roundtrip of h1/h3 in the backward —
    bounded like the dynamic_int8_bwd noise (runs/int8_bwd_quality). "_q8s" saves
    h1 only and recomputes h3 exactly, so its grads are at least as close."""
    params, config = _make()
    cfg_ref = config.replace(activation_checkpointing=True, remat_policy="flash_proj", attn_impl="xla")
    cfg_q8 = cfg_ref.replace(remat_policy=policy)
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 16)).astype(np.int32))
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (2, 16)).astype(np.int64))

    def loss_fn(p, cfg):
        return llama.forward(p, cfg, tokens, labels=labels)

    l_ref, g_ref = jax.value_and_grad(loss_fn)(params, cfg_ref)
    l_q8, g_q8 = jax.value_and_grad(loss_fn)(params, cfg_q8)
    # primal path: identical math, identical result
    np.testing.assert_allclose(float(l_ref), float(l_q8), rtol=1e-6)
    for (n1, a), (n2, b) in zip(named_leaves(g_ref), named_leaves(g_q8)):
        assert n1 == n2
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(a).max() + 1e-30
        # int8 rowwise roundtrip on h1/h3: per-element ~0.4% of rowmax; allow 3%
        # of the per-tensor grad max after propagation through the trunk
        np.testing.assert_allclose(b / denom, a / denom, atol=0.03, err_msg=n1)


def test_q8_remat_qlora_trains():
    """q8 remat composes with the bench stack (int8 frozen base + LoRA + int8 dgrads):
    the train step runs and only LoRA leaves receive gradients."""
    from llama_x_tpu.adapters import apply_linear_adapter, quantize_linear, trainable_mask

    config = llama.tiny_config(
        activation_checkpointing=True, remat_policy="flash_proj_q8", attn_impl="xla",
        dynamic_int8_act=True, dynamic_int8_bwd=True,
    )
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    layers = quantize_linear(params["layers"], "int8")
    params = dict(params, layers=apply_linear_adapter(layers, "lora", jax.random.PRNGKey(1)))
    mask = trainable_mask(params)

    rng = np.random.default_rng(7)
    # [accum=1, B, S] — make_train_step scans the leading micro-batch axis
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (1, 2, 16)).astype(np.int32))
    labels = jnp.asarray(rng.integers(0, config.vocab_size, (1, 2, 16)).astype(np.int64))

    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    def loss_fn(p, mb):
        return llama.forward(p, config, mb["tokens"], labels=mb["labels"]), jnp.sum(mb["labels"] != -100)

    tx = get_optimizer("AdamW", 1e-3)
    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))
    batch = {"tokens": tokens, "labels": labels}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # LoRA grads flow through the q8 backward
