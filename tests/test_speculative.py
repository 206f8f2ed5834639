"""Speculative decoding (models/speculative.py): greedy draft/verify must reproduce
the target model's own greedy trajectory exactly, at fewer target passes."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate
from llama_x_tpu.models.speculative import generate_speculative


def _models():
    config = llama.tiny_config(max_seq_len=128)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    draft_config = llama.tiny_config(max_seq_len=128, num_layers=1, embed_dim=32,
                                     num_heads=2, num_kv_heads=2, head_dim=16,
                                     intermediate_dim=64)
    draft_params = llama.init(jax.random.PRNGKey(1), draft_config, dtype=jnp.float32)
    return config, params, draft_config, draft_params


def test_speculative_matches_target_greedy():
    """Independent (uncorrelated) draft: output must still equal target-only greedy."""
    config, params, draft_config, draft_params = _models()
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, config.vocab_size, (1, 8)), jnp.int32)

    want = generate(params, config, prompt, max_new_tokens=24, cache_dtype=jnp.float32)
    got, stats = generate_speculative(
        params, config, draft_params, draft_config, prompt,
        max_new_tokens=24, gamma=4, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["tokens_emitted"]) >= 24


def test_speculative_self_draft_full_acceptance():
    """Target as its own draft: every proposal accepted -> gamma tokens per verify
    pass, so target_passes ~ 1 (prefill) + ceil((n-1)/gamma)."""
    config, params, _, _ = _models()
    prompt = jnp.asarray(np.random.default_rng(1).integers(0, config.vocab_size, (1, 8)), jnp.int32)

    n, gamma = 25, 4
    want = generate(params, config, prompt, max_new_tokens=n, cache_dtype=jnp.float32)
    got, stats = generate_speculative(
        params, config, params, config, prompt,
        max_new_tokens=n, gamma=gamma, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["target_passes"]) == 1 + int(np.ceil((n - 1) / gamma))


def test_speculative_eos_padding():
    """Rows emitting eos pad the remainder, matching generate()'s contract."""
    config, params, draft_config, draft_params = _models()
    prompt = jnp.asarray(np.random.default_rng(2).integers(0, config.vocab_size, (1, 6)), jnp.int32)
    # pick the 3rd greedy token as the eos so it triggers mid-round
    ref = np.asarray(generate(params, config, prompt, max_new_tokens=8, cache_dtype=jnp.float32))
    eos = int(ref[0, 2])

    want = generate(params, config, prompt, max_new_tokens=12, eos_id=eos, pad_id=0, cache_dtype=jnp.float32)
    got, _ = generate_speculative(
        params, config, draft_params, draft_config, prompt,
        max_new_tokens=12, gamma=4, eos_id=eos, pad_id=0, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_gamma_one():
    """gamma=1 degenerates to alternating draft/verify and still matches greedy."""
    config, params, draft_config, draft_params = _models()
    prompt = jnp.asarray(np.random.default_rng(3).integers(0, config.vocab_size, (1, 4)), jnp.int32)
    want = generate(params, config, prompt, max_new_tokens=10, cache_dtype=jnp.float32)
    got, _ = generate_speculative(
        params, config, draft_params, draft_config, prompt,
        max_new_tokens=10, gamma=1, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
