"""Decode-path tests: prefill+scan generation must match the full-forward oracle
(SURVEY.md §3 'Inference path' — the reference has the cache but no sampler; parity here
is greedy-continuation equivalence between the cached decode and re-running the full
causal forward each step)."""

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate, sample_logits


def _greedy_oracle(params, config, prompt, n):
    """Re-run the full causal forward per step (no cache) and take argmax."""
    toks = prompt
    out = []
    for _ in range(n):
        logits = llama.forward(params, config, toks)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out.append(nxt)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    return jnp.stack(out, axis=1)


def test_greedy_generate_matches_full_forward():
    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, config.vocab_size, (2, 8)), jnp.int32)

    got = generate(params, config, prompt, max_new_tokens=6, temperature=0.0, cache_dtype=jnp.float32)
    want = _greedy_oracle(params, config, prompt, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_eos_padding():
    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    prompt = jnp.asarray(np.random.default_rng(1).integers(0, config.vocab_size, (1, 4)), jnp.int32)
    # force eos on the very first sampled token: eos_id = whatever greedy produces
    first = int(generate(params, config, prompt, max_new_tokens=1, cache_dtype=jnp.float32)[0, 0])
    out = generate(params, config, prompt, max_new_tokens=5, eos_id=first, pad_id=0, cache_dtype=jnp.float32)
    assert int(out[0, 0]) == first
    np.testing.assert_array_equal(np.asarray(out[0, 1:]), 0)


def test_int8_params_generate_matches_dequantized():
    """generate() composes with int8-quantized layers (the 8B serving path: weights
    halve in HBM and decode is weight-bandwidth-bound): greedy tokens must match a
    model whose params were dequantized back to floats by hand."""
    from llama_x_tpu.adapters import quantize_linear

    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(3), config, dtype=jnp.float32)
    qparams = dict(params, layers=quantize_linear(params["layers"], "int8"))

    def dequant(tree):
        if isinstance(tree, dict) and "int_data" in tree:
            w = tree["int_data"].astype(jnp.float32) * tree["scale"][..., None].astype(jnp.float32)
            return {k: v for k, v in tree.items() if k not in ("int_data", "scale")} | {
                "kernel": jnp.swapaxes(w, -1, -2)
            }
        if isinstance(tree, dict):
            return {k: dequant(v) for k, v in tree.items()}
        return tree

    dparams = dequant(qparams)
    prompt = jnp.asarray(np.random.default_rng(2).integers(0, config.vocab_size, (2, 8)), jnp.int32)
    got = generate(qparams, config, prompt, max_new_tokens=6, cache_dtype=jnp.float32)
    want = generate(dparams, config, prompt, max_new_tokens=6, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_logits_temperature_topk():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
    assert int(sample_logits(key, logits, 0.0, 0)[0]) == 1
    # top_k=1 must always pick the argmax regardless of temperature
    for i in range(5):
        tok = sample_logits(jax.random.PRNGKey(i), logits, 1.5, 1)
        assert int(tok[0]) == 1
    # high temperature, full vocab: samples vary across keys
    toks = {int(sample_logits(jax.random.PRNGKey(i), logits, 10.0, 0)[0]) for i in range(32)}
    assert len(toks) > 1


def test_sample_logits_top_p():
    # probs ~ softmax([4, 3, 0, -5]) = [.729, .268, .0134, .0000]: nucleus at
    # top_p=0.5 is {token 0} alone (exclusive prefix sum 0 < 0.5, next is 0.729 > 0.5)
    logits = jnp.asarray([[4.0, 3.0, 0.0, -5.0]])
    for i in range(16):
        assert int(sample_logits(jax.random.PRNGKey(i), logits, 1.0, 0, top_p=0.5)[0]) == 0
    # top_p=0.9 admits tokens {0, 1} (0.729 + 0.268 = 0.997 ≥ 0.9) but never 2/3
    toks = {int(sample_logits(jax.random.PRNGKey(i), logits, 1.0, 0, top_p=0.9)[0]) for i in range(64)}
    assert toks == {0, 1}
    # top_p=1.0 is a no-op: the filter leaves the full distribution
    toks = {int(sample_logits(jax.random.PRNGKey(i), logits, 10.0, 0, top_p=1.0)[0]) for i in range(64)}
    assert len(toks) >= 3
    # the nucleus always contains the top token even when top_p ~ 0
    assert int(sample_logits(jax.random.PRNGKey(0), logits, 2.0, 0, top_p=1e-6)[0]) == 0


def test_ragged_batched_generate_matches_per_row():
    """prompt_lens: right-padded rows of different lengths in ONE batch — each row's
    greedy continuation must equal its own unbatched generate() exactly (the pad-slot
    overwrite + per-row kv_len masking must coincide perfectly)."""
    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(1), config, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    rows = [rng.integers(1, config.vocab_size, (n,)) for n in (3, 8, 5)]
    P = max(len(r) for r in rows)
    padded = np.zeros((3, P), np.int32)
    for i, r in enumerate(rows):
        padded[i, : len(r)] = r
    lens = jnp.asarray([len(r) for r in rows], jnp.int32)

    got = generate(
        params, config, jnp.asarray(padded), max_new_tokens=8,
        prompt_lens=lens, cache_dtype=jnp.float32,
    )
    for i, r in enumerate(rows):
        want = generate(
            params, config, jnp.asarray(r[None, :], jnp.int32), max_new_tokens=8,
            cache_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want[0]), err_msg=f"row {i}")


def test_ragged_generate_eos_per_row():
    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(3), config, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    padded = rng.integers(1, config.vocab_size, (2, 8)).astype(np.int32)
    padded[0, 5:] = 0
    lens = jnp.asarray([5, 8], jnp.int32)
    ref = np.asarray(generate(params, config, jnp.asarray(padded), max_new_tokens=8,
                              prompt_lens=lens, cache_dtype=jnp.float32))
    eos = int(ref[0, 2])  # row 0 stops at its 3rd token
    got = np.asarray(generate(params, config, jnp.asarray(padded), max_new_tokens=8,
                              prompt_lens=lens, eos_id=eos, pad_id=0, cache_dtype=jnp.float32))
    row0 = ref[0].copy()
    stop = int(np.argmax(row0 == eos))
    row0[stop + 1:] = 0
    np.testing.assert_array_equal(got[0], row0)


def test_sample_logits_min_p():
    logits = jnp.asarray([[np.log(0.5), np.log(0.3), np.log(0.15), np.log(0.05)]], jnp.float32)
    # min_p=0.4: only tokens with p >= 0.4*0.5=0.2 survive -> {0, 1}
    toks = {int(sample_logits(jax.random.PRNGKey(i), logits, 1.0, 0, min_p=0.4)[0]) for i in range(64)}
    assert toks <= {0, 1} and len(toks) == 2
    # min_p=0 is a no-op: the tail token stays reachable at high temperature
    toks = {int(sample_logits(jax.random.PRNGKey(i), logits, 5.0, 0, min_p=0.0)[0]) for i in range(64)}
    assert len(toks) >= 3


def test_generate_stream_matches_generate():
    """Chunked decode (prefill_start + decode_chunk) reuses generate()'s key schedule,
    so concatenated stream blocks equal the one-shot program exactly — greedy and
    sampled, uniform and ragged."""
    from llama_x_tpu.models.generate import generate_stream

    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(0, config.vocab_size, (2, 8)), jnp.int32)

    for kw in (
        dict(temperature=0.0),
        dict(temperature=0.9, top_k=8, top_p=0.9, key=jax.random.PRNGKey(7)),
    ):
        want = generate(params, config, prompt, max_new_tokens=13, cache_dtype=jnp.float32, **kw)
        got = np.concatenate(list(generate_stream(
            params, config, prompt, max_new_tokens=13, chunk_size=5,
            cache_dtype=jnp.float32, **kw,
        )), axis=1)
        assert got.shape[1] == 13  # no eos configured: all chunks run
        np.testing.assert_array_equal(got, np.asarray(want))


def test_generate_stream_ragged_and_early_exit():
    from llama_x_tpu.models.generate import generate_stream

    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    prompt = np.full((3, 10), 1, np.int32)
    lens = [4, 10, 7]
    for i, n in enumerate(lens):
        prompt[i, :n] = rng.integers(0, config.vocab_size, n)
    prompt = jnp.asarray(prompt)
    prompt_lens = jnp.asarray(lens, jnp.int32)

    want = generate(params, config, prompt, max_new_tokens=9, prompt_lens=prompt_lens,
                    cache_dtype=jnp.float32)
    got = np.concatenate(list(generate_stream(
        params, config, prompt, max_new_tokens=9, chunk_size=4, prompt_lens=prompt_lens,
        cache_dtype=jnp.float32,
    )), axis=1)
    np.testing.assert_array_equal(got, np.asarray(want))

    # early exit: make every row's FIRST token the eos -> only the prefill block
    # is yielded, no decode_chunk dispatch runs
    firsts = np.asarray(want)[:, 0]
    eos = int(firsts[0])
    if (firsts == eos).all():  # only meaningful if rows agree; force via single row
        pass
    row = jnp.asarray(prompt[:1])
    first = int(np.asarray(generate(params, config, row, max_new_tokens=1,
                                    cache_dtype=jnp.float32))[0, 0])
    blocks = list(generate_stream(
        params, config, row, max_new_tokens=9, chunk_size=4, eos_id=first,
        cache_dtype=jnp.float32,
    ))
    assert len(blocks) == 1 and blocks[0].shape == (1, 1)
