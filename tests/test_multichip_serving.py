"""Sharded serving surfaces (VERDICT r4 #2): the round-4 serving machinery —
int8-KV decode, speculative draft/verify rounds, the continuous-batching
admission+decode cycle — run under tensor/data-parallel shardings on the 8
simulated CPU devices and must emit tokens identical to single-device.

These mirror the `dryrun_multichip` sections in __graft_entry__.py so the
driver-level checks have same-shaped CPU tests (SURVEY.md §4 test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate
from llama_x_tpu.models.speculative import generate_speculative
from llama_x_tpu.parallel import make_mesh, shard_params
from llama_x_tpu.serve import continuous as cont

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 sim devices")


@pytest.fixture(scope="module")
def setup():
    cfg = llama.tiny_config(max_seq_len=128, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 16)).astype(np.int32))
    mesh_tp = make_mesh(dp=1, fsdp=1, tp=4, devices=jax.devices()[:4])
    return cfg, params, shard_params(params, mesh_tp), prompt, mesh_tp


def test_tp_int8_kv_decode_matches_single_device(setup):
    cfg, params, sparams, prompt, _ = setup
    want = np.asarray(generate(params, cfg, prompt, max_new_tokens=8, cache_dtype=jnp.int8))
    got = np.asarray(generate(sparams, cfg, prompt, max_new_tokens=8, cache_dtype=jnp.int8))
    assert (got == want).all(), (got, want)


def test_tp_speculative_matches_single_device_and_target_greedy(setup):
    cfg, params, sparams, prompt, mesh_tp = setup
    dcfg = llama.tiny_config(max_seq_len=128, attn_impl="xla", num_layers=2)
    dparams = llama.init(jax.random.PRNGKey(6), dcfg, dtype=jnp.float32)
    want, _ = generate_speculative(params, cfg, dparams, dcfg, prompt, max_new_tokens=8, gamma=3)
    got, _ = generate_speculative(
        sparams, cfg, shard_params(dparams, mesh_tp), dcfg, prompt, max_new_tokens=8, gamma=3
    )
    assert (np.asarray(got) == np.asarray(want)).all()
    greedy = np.asarray(generate(params, cfg, prompt, max_new_tokens=8))
    assert (np.asarray(got) == greedy).all()


def test_dp_tp_continuous_cycle_matches_unbatched_generate(setup):
    cfg, params, _, prompt, _ = setup
    mesh_dt = make_mesh(dp=2, fsdp=1, tp=4, devices=jax.devices())
    cparams = shard_params(params, mesh_dt)
    n_slots = 4
    state = cont.init_state(cfg, n_slots)
    samp = jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32)  # greedy
    eos = jnp.asarray(-1, jnp.int32)
    key = jax.random.PRNGKey(7)
    f0, state = cont.admit_row(
        cparams, cfg, state, jnp.asarray(0), prompt[0:1], jnp.asarray(16), key, samp, eos
    )
    # chunked-prefill admission for row 1 (first + continuation chunk)
    rc = llama.init_kv_cache(cfg, 1)
    rc, _ = cont.prefill_chunk(cparams, cfg, rc, prompt[1:2, :8], jnp.asarray(0), jnp.asarray(8), True)
    rc, h_last = cont.prefill_chunk(cparams, cfg, rc, prompt[1:2, 8:], jnp.asarray(8), jnp.asarray(8), False)
    f1 = cont.sample_first(cparams, cfg, h_last, key, samp)
    state = cont.install_row(state, jnp.asarray(1), rc, f1, jnp.asarray(16), eos)
    zs = jnp.zeros((n_slots,), jnp.float32)
    toks, state = cont.decode_rows(
        cparams, cfg, state, jax.random.split(jax.random.PRNGKey(8), 7),
        zs, jnp.zeros((n_slots,), jnp.int32), jnp.ones((n_slots,), jnp.float32), zs,
        jnp.full((n_slots,), -1, jnp.int32), jnp.full((n_slots,), 8, jnp.int32),
    )
    got = np.concatenate([np.asarray([[int(f0)], [int(f1)]]), np.asarray(toks[:2])], axis=1)
    want = np.asarray(generate(params, cfg, prompt, max_new_tokens=8))
    assert (got == want).all(), (got, want)
