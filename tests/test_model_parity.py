"""Golden parity: tiny-config JAX Llama vs the independent PyTorch oracle
(BASELINE.json: 'logits matched to the PyTorch reference', CPU-runnable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
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
