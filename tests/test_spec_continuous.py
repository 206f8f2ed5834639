"""Speculative continuous batching (llama_x_tpu/serve/speculative.py): per-row
greedy exactness vs unbatched generate() under slot reuse and mid-stream admission,
sampled rows, per-row eos, acceptance accounting, and the int8-cache form."""

import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate
from llama_x_tpu.serve.speculative import SpeculativeScheduler


@pytest.fixture(scope="module")
def models():
    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    # a distinct (worse) draft: greedy acceptance will be partial, which is the
    # interesting regime — the target's trajectory must survive any acceptance rate
    draft_config = llama.tiny_config(num_layers=1, max_seq_len=64)
    draft_params = llama.init(jax.random.PRNGKey(7), draft_config, dtype=jnp.float32)
    return params, config, draft_params, draft_config


def _isolated(params, config, ids, n, cache_dtype=jnp.float32, eos_id=-1):
    """Reference: the TARGET's own unbatched generate(), truncated at eos inclusive
    (speculative greedy == target greedy, models/speculative.py's law)."""
    out = np.asarray(generate(
        params, config, jnp.asarray([ids], jnp.int32), max_new_tokens=n,
        cache_dtype=cache_dtype, eos_id=eos_id,
    ))[0]
    toks = []
    for t in out:
        toks.append(int(t))
        if t == eos_id:
            break
    return toks


def _prompts(config, lens, seed=3):
    rng = np.random.default_rng(seed)
    return [[int(t) for t in rng.integers(0, config.vocab_size, n)] for n in lens]


def _sched(models, **kw):
    params, config, draft_params, draft_config = models
    base = dict(n_slots=2, chunk_size=2, gamma=3, prompt_multiple=16,
                cache_dtype=jnp.float32)
    base.update(kw)
    return SpeculativeScheduler(params, config, draft_params, draft_config, **base)


def test_spec_greedy_matches_target_generate_with_slot_reuse(models):
    """3 requests through 2 slots: every greedy row must equal the target's own
    unbatched generate() regardless of acceptance or co-tenants."""
    params, config = models[0], models[1]
    sched = _sched(models)
    try:
        prompts = _prompts(config, [5, 11, 8])
        rows = [sched.submit(p, max_tokens=10) for p in prompts]
        for r in rows:
            assert r.event.wait(timeout=300) and r.error is None
        for p, r in zip(prompts, rows):
            want = _isolated(params, config, p, 10)
            assert r.tokens == want, (r.tokens, want)
        assert sched.admissions == 3 and sched.rounds_run > 0
    finally:
        sched.close()


def test_spec_mid_stream_admission(models):
    """A second request admitted while the first is mid-generation (proven via its
    stream queue) — both rows still match the target's isolated outputs."""
    params, config = models[0], models[1]
    sched = _sched(models, chunk_size=1)
    try:
        pa, pb = _prompts(config, [6, 9], seed=11)
        qa: queue.Queue = queue.Queue()
        ra = sched.submit(pa, max_tokens=16, stream_q=qa)
        got_first = qa.get(timeout=300)  # A is now running
        assert got_first
        rb = sched.submit(pb, max_tokens=8)
        assert ra.event.wait(timeout=300) and rb.event.wait(timeout=300)
        assert ra.tokens == _isolated(params, config, pa, 16)
        assert rb.tokens == _isolated(params, config, pb, 8)
        pieces = list(got_first)
        while True:
            d = qa.get(timeout=60)
            if d is None:
                break
            pieces.extend(d)
        assert pieces == ra.tokens
    finally:
        sched.close()


def test_spec_mixed_greedy_and_sampled(models):
    """A greedy row and a rejection-sampled row share the batch: the greedy row is
    exact; the sampled row emits its full budget of in-vocab tokens."""
    params, config = models[0], models[1]
    sched = _sched(models)
    try:
        pg, ps = _prompts(config, [7, 7], seed=21)
        rg = sched.submit(pg, max_tokens=12)
        rs = sched.submit(ps, max_tokens=12, sampling=(1.1, 9, 0.9, 0.0))
        assert rg.event.wait(timeout=300) and rs.event.wait(timeout=300)
        assert rg.error is None and rs.error is None
        assert rg.tokens == _isolated(params, config, pg, 12)
        assert len(rs.tokens) == 12 and all(0 <= t < config.vocab_size for t in rs.tokens)
    finally:
        sched.close()


def test_spec_per_row_eos(models):
    """A row stops on its own eos id mid-round (the round's emission is cut at the
    eos, even when acceptance would have emitted more)."""
    params, config = models[0], models[1]
    p = _prompts(config, [5], seed=31)[0]
    full = _isolated(params, config, p, 10)
    eos = full[4]
    want = full[: full.index(eos) + 1]
    sched = _sched(models)
    try:
        r = sched.submit(p, max_tokens=10, eos_id=eos)
        other = sched.submit(_prompts(config, [4], seed=32)[0], max_tokens=10)
        assert r.event.wait(timeout=300) and other.event.wait(timeout=300)
        assert r.tokens == want and r.finish_reason == "stop"
        assert other.finish_reason == "length"
    finally:
        sched.close()


def test_spec_self_draft_full_acceptance(models):
    """Draft == target: greedy acceptance is total, so every round must emit
    gamma+1 tokens (bonus included) — the acceptance ceiling — and outputs stay
    exact. rounds_run * (gamma+1) bounds the emitted count from above."""
    params, config = models[0], models[1]
    sched = SpeculativeScheduler(params, config, params, config, n_slots=1,
                                 chunk_size=1, gamma=3, prompt_multiple=16,
                                 cache_dtype=jnp.float32)
    try:
        p = _prompts(config, [6], seed=41)[0]
        r = sched.submit(p, max_tokens=13)
        assert r.event.wait(timeout=300) and r.error is None
        assert r.tokens == _isolated(params, config, p, 13)
        # 1 admission token + ceil(12 / 4) rounds at full acceptance, plus at most
        # one extra round from the scheduler's in-flight pipelining (the host learns
        # a row finished one chunk after the device froze it)
        assert 3 <= sched.rounds_run <= 4, sched.rounds_run
    finally:
        sched.close()


def test_spec_int8_cache(models):
    """Both caches quantized: greedy row matches the target's generate(int8)."""
    params, config = models[0], models[1]
    sched = _sched(models, cache_dtype=jnp.int8)
    try:
        p = _prompts(config, [9], seed=51)[0]
        r = sched.submit(p, max_tokens=8)
        assert r.event.wait(timeout=300) and r.error is None
        assert r.tokens == _isolated(params, config, p, 8, cache_dtype=jnp.int8)
    finally:
        sched.close()
