"""Speculative decoding (models/speculative.py): greedy draft/verify must reproduce
the target model's own greedy trajectory exactly, at fewer target passes; the sampled
path's rejection step must preserve the target distribution."""

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
    assert int(stats["tokens_emitted"][0]) >= 24


def test_speculative_self_draft_full_acceptance():
    """Target as its own draft: every proposal accepted -> gamma+1 tokens per verify
    pass (gamma drafts + the bonus token at the verify pass's last position), so
    target_passes ~ 1 (prefill) + ceil((n-1)/(gamma+1))."""
    config, params, _, _ = _models()
    prompt = jnp.asarray(np.random.default_rng(1).integers(0, config.vocab_size, (1, 8)), jnp.int32)

    n, gamma = 25, 4
    want = generate(params, config, prompt, max_new_tokens=n, cache_dtype=jnp.float32)
    got, stats = generate_speculative(
        params, config, params, config, prompt,
        max_new_tokens=n, gamma=gamma, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["target_passes"]) == 1 + int(np.ceil((n - 1) / (gamma + 1)))


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


def test_batched_speculative_matches_target_greedy():
    """B=3 rows accept at different rates (per-row positions desynchronize); every
    row must still equal its own target-greedy trajectory exactly."""
    config, params, draft_config, draft_params = _models()
    prompt = jnp.asarray(np.random.default_rng(8).integers(0, config.vocab_size, (3, 8)), jnp.int32)

    want = generate(params, config, prompt, max_new_tokens=20, cache_dtype=jnp.float32)
    got, stats = generate_speculative(
        params, config, draft_params, draft_config, prompt,
        max_new_tokens=20, gamma=3, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["tokens_emitted"].shape == (3,)


def test_ragged_speculative_matches_per_row():
    """Ragged rows (prompt_lens): each row of a mixed-length batch must equal its own
    unbatched speculative run (which itself equals target greedy) — the serving
    coalescer's batch shape."""
    config, params, draft_config, draft_params = _models()
    rng = np.random.default_rng(11)
    lens = [5, 9, 3]
    P = max(lens)
    rows = [rng.integers(1, config.vocab_size, (n,)) for n in lens]
    padded = np.zeros((3, P), np.int32)
    for i, r in enumerate(rows):
        padded[i, : len(r)] = r

    got, stats = generate_speculative(
        params, config, draft_params, draft_config, jnp.asarray(padded),
        max_new_tokens=16, gamma=3, cache_dtype=jnp.float32,
        prompt_lens=jnp.asarray(lens, jnp.int32),
    )
    for i, r in enumerate(rows):
        want, _ = generate_speculative(
            params, config, draft_params, draft_config,
            jnp.asarray(r, jnp.int32)[None, :],
            max_new_tokens=16, gamma=3, cache_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want[0]), err_msg=f"row {i}")
    assert stats["tokens_emitted"].shape == (3,)


def test_batched_speculative_per_row_eos():
    """One row hits eos early and freezes (padded tail) while the others keep
    decoding to full length — exactly generate()'s per-row eos contract."""
    config, params, draft_config, draft_params = _models()
    prompt = jnp.asarray(np.random.default_rng(9).integers(0, config.vocab_size, (3, 6)), jnp.int32)
    ref = np.asarray(generate(params, config, prompt, max_new_tokens=6, cache_dtype=jnp.float32))
    eos = int(ref[1, 2])  # row 1's 3rd token -> that row stops early

    want = generate(params, config, prompt, max_new_tokens=16, eos_id=eos, pad_id=0, cache_dtype=jnp.float32)
    got, _ = generate_speculative(
        params, config, draft_params, draft_config, prompt,
        max_new_tokens=16, gamma=4, eos_id=eos, pad_id=0, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batched_sampled_speculative_rows_independent():
    """Sampled path at B=3 with IDENTICAL prompt rows: per-row keys (vmapped accept,
    per-row gumbel noise) must make the rows sample independently — identical rows
    would mean a key was reused across the batch. Self-draft keeps acceptance at
    gamma+1/round, pinning the frozen-row/full-accept interplay under vmap too."""
    config, params, _, _ = _models()
    row = np.random.default_rng(10).integers(0, config.vocab_size, (1, 8))
    prompt = jnp.asarray(np.repeat(row, 3, axis=0), jnp.int32)
    n, gamma = 20, 3
    got, stats = generate_speculative(
        params, config, params, config, prompt,
        max_new_tokens=n, gamma=gamma, key=jax.random.PRNGKey(11),
        temperature=1.0, cache_dtype=jnp.float32,
    )
    out = np.asarray(got)
    assert out.shape == (3, n)
    assert (np.asarray(stats["tokens_emitted"]) >= n).all()
    # 20 tokens over a 256-vocab at temperature 1: identical rows are ~impossible
    # unless keys are shared across rows
    assert not (np.all(out[0] == out[1]) and np.all(out[1] == out[2]))
    assert int(stats["target_passes"]) == 1 + int(np.ceil((n - 1) / (gamma + 1)))


def test_rejection_sampling_preserves_target_distribution():
    """The pure accept step (speculative_accept): over many keys, the FIRST emitted
    token's empirical law must be the target row p_0 — regardless of how bad the
    draft q is. This is the mathematical content of speculative sampling."""
    from llama_x_tpu.models.speculative import speculative_accept

    rng = np.random.default_rng(7)
    V, gamma = 11, 3
    q = rng.dirichlet(np.ones(V) * 0.6, size=gamma).astype(np.float32)
    p = rng.dirichlet(np.ones(V) * 0.6, size=gamma + 1).astype(np.float32)
    q_j, p_j = jnp.asarray(q), jnp.asarray(p)

    n = 40_000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draft_keys = jax.random.split(jax.random.PRNGKey(1), n)

    @jax.jit
    @jax.vmap
    def trial(key, d_key):
        # drafts ~ q rows (the accept step's contract)
        drafts = jax.vmap(lambda k, row: jax.random.categorical(k, jnp.log(row)))(
            jax.random.split(d_key, gamma), q_j
        ).astype(jnp.int32)
        emitted, m = speculative_accept(key, drafts, q_j, p_j)
        return emitted[0], m

    first, m = trial(keys, draft_keys)
    counts = np.bincount(np.asarray(first), minlength=V) / n
    # 40k samples: per-bin standard error ~ sqrt(p/n) <= 0.0025 — 4 sigma tolerance
    np.testing.assert_allclose(counts, p[0], atol=0.012)
    assert 1 <= int(np.asarray(m).min()) and int(np.asarray(m).max()) <= gamma + 1


def test_sampled_speculative_self_draft_always_accepts():
    """Sampled path, target as its own draft: p == q makes the acceptance ratio 1, so
    every round emits gamma+1 tokens — ancestral sampling from the target at
    ceil(n/(gamma+1)) verify passes. Also pins the sampled path end-to-end."""
    config, params, _, _ = _models()
    prompt = jnp.asarray(np.random.default_rng(4).integers(0, config.vocab_size, (1, 8)), jnp.int32)
    n, gamma = 24, 3
    got, stats = generate_speculative(
        params, config, params, config, prompt,
        max_new_tokens=n, gamma=gamma, key=jax.random.PRNGKey(5),
        temperature=0.8, top_k=0, top_p=0.95, cache_dtype=jnp.float32,
    )
    assert got.shape == (1, n)
    assert int(stats["tokens_emitted"][0]) >= n
    assert int(stats["target_passes"]) == 1 + int(np.ceil((n - 1) / (gamma + 1)))
