"""Continuous batching scheduler: per-row sampling parity, greedy exactness vs
unbatched generate() under slot reuse / mid-stream admission / mixed sampling
configs, per-row eos, and the int8-cache form."""

import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate, sample_logits
from llama_x_tpu.serve.continuous import ContinuousScheduler, sample_logits_rows


@pytest.fixture(scope="module")
def model():
    config = llama.tiny_config(max_seq_len=64)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    return params, config


def _isolated(params, config, ids, n, cache_dtype=jnp.float32, eos_id=-1):
    """Reference: unbatched generate(), truncated at eos (inclusive) like the
    scheduler's raw emissions."""
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


def test_sample_logits_rows_matches_scalar():
    """Uniform rows + same key must draw the SAME tokens as the scalar sampler —
    the continuous path may not change sampling semantics."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 97)), jnp.float32)
    B = logits.shape[0]
    for sig in [(0.0, 0, 1.0, 0.0), (0.8, 0, 1.0, 0.0), (1.2, 7, 1.0, 0.0),
                (0.9, 0, 0.7, 0.0), (1.0, 13, 0.85, 0.05), (2.0, 0, 1.0, 0.2)]:
        t, k, p, mp = sig
        for s in range(3):
            key = jax.random.PRNGKey(s)
            want = sample_logits(key, logits, t, k, p, mp)
            got = sample_logits_rows(
                key, logits,
                jnp.full((B,), t, jnp.float32), jnp.full((B,), k, jnp.int32),
                jnp.full((B,), p, jnp.float32), jnp.full((B,), mp, jnp.float32),
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want)), sig


def test_continuous_greedy_matches_generate_with_slot_reuse(model):
    """3 requests through 2 slots (forces queueing + slot reuse): every row's
    greedy output must equal its own unbatched generate()."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.float32)
    try:
        prompts = _prompts(config, [5, 11, 8])
        rows = [sched.submit(p, max_tokens=10) for p in prompts]
        for r in rows:
            assert r.event.wait(timeout=300) and r.error is None
        for p, r in zip(prompts, rows):
            want = _isolated(params, config, p, 10)
            assert r.tokens == want, (r.tokens, want)
            assert r.finish_reason == "length"
        assert sched.admissions == 3
    finally:
        sched.close()


def test_continuous_mid_stream_admission(model):
    """A second request admitted while the first is mid-generation (proven via its
    stream queue) — both rows still match their isolated outputs exactly."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=2,
                                prompt_multiple=16, cache_dtype=jnp.float32)
    try:
        pa, pb = _prompts(config, [6, 9], seed=11)
        qa: queue.Queue = queue.Queue()
        ra = sched.submit(pa, max_tokens=20, stream_q=qa)
        got_first = qa.get(timeout=300)  # A is now running
        assert got_first
        rb = sched.submit(pb, max_tokens=8)
        assert ra.event.wait(timeout=300) and rb.event.wait(timeout=300)
        assert ra.tokens == _isolated(params, config, pa, 20)
        assert rb.tokens == _isolated(params, config, pb, 8)
        # drain A's stream: deltas concatenate to the final tokens
        pieces = list(got_first)
        while True:
            d = qa.get(timeout=60)
            if d is None:
                break
            pieces.extend(d)
        assert pieces == ra.tokens
    finally:
        sched.close()


def test_continuous_mixed_sampling_configs(model):
    """A greedy row and a sampled row share the batch; the greedy row is exact and
    the sampled row emits its budget of in-vocab tokens."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.float32)
    try:
        pg, ps = _prompts(config, [7, 7], seed=21)
        rg = sched.submit(pg, max_tokens=12)
        rs = sched.submit(ps, max_tokens=12, sampling=(1.1, 9, 0.9, 0.0))
        assert rg.event.wait(timeout=300) and rs.event.wait(timeout=300)
        assert rg.tokens == _isolated(params, config, pg, 12)
        assert len(rs.tokens) == 12 and all(0 <= t < config.vocab_size for t in rs.tokens)
    finally:
        sched.close()


def test_continuous_per_row_eos(model):
    """Each row can stop on its OWN eos id (chat eot vs plain eos in one batch):
    pick the token the greedy row emits mid-way as its eos and pin the cut."""
    params, config = model
    p = _prompts(config, [5], seed=31)[0]
    full = _isolated(params, config, p, 10)
    eos = full[4]  # force a stop at the first occurrence of this token
    want = full[: full.index(eos) + 1]
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=3,
                                prompt_multiple=16, cache_dtype=jnp.float32)
    try:
        r = sched.submit(p, max_tokens=10, eos_id=eos)
        other = sched.submit(_prompts(config, [4], seed=32)[0], max_tokens=10)
        assert r.event.wait(timeout=300) and other.event.wait(timeout=300)
        assert r.tokens == want and r.finish_reason == "stop"
        assert other.finish_reason == "length"
    finally:
        sched.close()


def test_prefix_cache_hit_is_exact(model):
    """Automatic prefix caching: prompt B shares A's first 32 tokens (2 buckets), so
    B admits through the cached-prefix path (prefill touches only the suffix) — its
    greedy output must still equal its own unbatched generate(). LRU accounting and
    an exact-repeat (proper-prefix match, suffix = the last sub-bucket) are pinned."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.float32,
                                prefix_cache=4)
    try:
        base = _prompts(config, [37], seed=51)[0]   # harvests ids[:32]
        other = base[:32] + _prompts(config, [9], seed=52)[0]  # same 2-bucket prefix
        ra = sched.submit(base, max_tokens=8)
        assert ra.event.wait(timeout=300) and ra.error is None
        assert sched.prefix_hits == 0 and len(sched.prefixes) == 1
        rb = sched.submit(other, max_tokens=8)
        rc = sched.submit(list(base), max_tokens=8)  # exact repeat: suffix = ids[32:]
        assert rb.event.wait(timeout=300) and rb.error is None
        assert rc.event.wait(timeout=300) and rc.error is None
        assert sched.prefix_hits == 2 and sched.prefix_tokens_reused == 64
        assert ra.tokens == _isolated(params, config, base, 8)
        assert rb.tokens == _isolated(params, config, other, 8)
        assert rc.tokens == ra.tokens
        # harvest of `other` dedupes into the same 32-token key
        assert len(sched.prefixes) == 1
    finally:
        sched.close()


def test_prefix_cache_lru_eviction(model):
    """prefix_cache=1: a second distinct prefix evicts the first; resubmitting the
    first prompt is a miss (and re-harvests), still exact."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.float32,
                                prefix_cache=1)
    try:
        pa, pb = _prompts(config, [20, 21], seed=61)
        for p in (pa, pb, pa):
            r = sched.submit(p, max_tokens=6)
            assert r.event.wait(timeout=300) and r.error is None
            assert r.tokens == _isolated(params, config, p, 6)
        assert sched.prefix_hits == 0 and len(sched.prefixes) == 1
    finally:
        sched.close()


def test_prefix_cache_int8(model):
    """Prefix slices of the quantized cache are (data, scale) trees; the hit path
    must match generate(cache_dtype=int8) exactly."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.int8,
                                prefix_cache=2)
    try:
        base = _prompts(config, [35], seed=71)[0]
        other = base[:32] + _prompts(config, [5], seed=72)[0]
        for p, want_hits in ((base, 0), (other, 1)):
            r = sched.submit(p, max_tokens=6)
            assert r.event.wait(timeout=300) and r.error is None
            assert r.tokens == _isolated(params, config, p, 6, cache_dtype=jnp.int8)
            assert sched.prefix_hits == want_hits
    finally:
        sched.close()


def test_chunked_prefill_exact(model):
    """prefill_chunk=16: a 40-token prompt admits over 3 chunks and a 10-token one
    over 1, interleaved with the other row's decode — outputs must equal unbatched
    generate() and the dispatch accounting must show exactly 4 prefill chunks."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=2,
                                prompt_multiple=16, cache_dtype=jnp.float32,
                                prefill_chunk=16)
    try:
        pa, pb = _prompts(config, [10, 40], seed=81)
        ra = sched.submit(pa, max_tokens=12)
        rb = sched.submit(pb, max_tokens=8)
        assert ra.event.wait(timeout=300) and rb.event.wait(timeout=300)
        assert ra.error is None and rb.error is None
        assert ra.tokens == _isolated(params, config, pa, 12)
        assert rb.tokens == _isolated(params, config, pb, 8)
        assert sched.prefill_dispatches == 4  # ceil(10/16) + ceil(40/16)
    finally:
        sched.close()


def test_chunked_prefill_prefix_hit(model):
    """Chunked prefill composes with prefix caching: the second prompt's cached
    32-token prefix is seeded, so only its 8-token suffix runs (1 chunk)."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.float32,
                                prefix_cache=2, prefill_chunk=16)
    try:
        base = _prompts(config, [40], seed=91)[0]
        other = base[:32] + _prompts(config, [8], seed=92)[0]
        ra = sched.submit(base, max_tokens=6)
        assert ra.event.wait(timeout=300) and ra.error is None
        d0 = sched.prefill_dispatches
        rb = sched.submit(other, max_tokens=6)
        assert rb.event.wait(timeout=300) and rb.error is None
        assert sched.prefix_hits == 1 and sched.prefill_dispatches == d0 + 1
        assert ra.tokens == _isolated(params, config, base, 6)
        assert rb.tokens == _isolated(params, config, other, 6)
    finally:
        sched.close()


def test_chunked_prefill_int8(model):
    """Chunked admission over the quantized cache (continuation chunks write
    (data, scale) rows) matches generate(cache_dtype=int8)."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.int8,
                                prefill_chunk=16)
    try:
        p = _prompts(config, [37], seed=101)[0]
        r = sched.submit(p, max_tokens=6)
        assert r.event.wait(timeout=300) and r.error is None
        assert r.tokens == _isolated(params, config, p, 6, cache_dtype=jnp.int8)
    finally:
        sched.close()


def test_continuous_int8_cache(model):
    """The quantized-cache form admits/scatters (data, scale) tuples and matches
    generate(cache_dtype=int8) greedily."""
    params, config = model
    sched = ContinuousScheduler(params, config, n_slots=2, chunk_size=4,
                                prompt_multiple=16, cache_dtype=jnp.int8)
    try:
        p = _prompts(config, [9], seed=41)[0]
        r = sched.submit(p, max_tokens=8)
        assert r.event.wait(timeout=300) and r.error is None
        assert r.tokens == _isolated(params, config, p, 8, cache_dtype=jnp.int8)
    finally:
        sched.close()
