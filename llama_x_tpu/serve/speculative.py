"""Speculative continuous batching: draft-propose / target-verify rounds over the
persistent slot batch.

models/speculative.py proves the round machinery (per-row acceptance, rejection
sampling, bonus token) inside ONE fused program per request batch; this module
re-hosts that round as the continuous scheduler's chunk step, so speculative
decoding composes with slot admission: requests join and leave the running batch
at round boundaries, every per-request quantity (sampling params, stop token,
budget) is a traced [n_slots] array, and each slot's acceptance advances its own
position — the compiled-program count stays O(prompt buckets) + 1 no matter the
traffic mix.

Per-row sampling semantics: a temperature==0 row accepts the longest draft prefix
matching the target's argmax and emits the target's own greedy tokens — its output
is the target-only greedy trajectory, whatever shares the batch (pinned by tests
against unbatched generate()). A sampled row runs the Leviathan/Chen rejection
step on per-row-filtered distributions (filter_logits_rows == the scalar path's
filter math), so its tokens are distributed exactly as target-only ancestral
sampling. Both kinds coexist in one dispatch: the round computes both acceptance
laws and selects per row.

Frozen and empty slots ride along with m = 0 (their draft/verify writes land at
held positions that their kv_len never exposes, and admission overwrites the whole
lane) — the same dead-lane price as plain continuous decode, recovered at the next
admission.

The reference has no sampling loop at all (SURVEY.md §3); vLLM-class engines treat
continuous batching and speculative decoding as separately-scheduled subsystems —
here one lax.scan round body serves both because positions were per-row arrays
from the start.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.speculative import speculative_accept
from llama_x_tpu.ops.attention import MaskInfo
from llama_x_tpu.serve.continuous import (
    ContinuousScheduler,
    RowHandle,
    _scatter_row,
    filter_logits_rows,
    sample_logits_rows,
)

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# device programs
# ---------------------------------------------------------------------------
# state pytree (dtypes frozen across dispatches — donation aliasing):
#   (t_cache, d_cache, prev [N] i32, cur [N] i32, pos [N] i32, done [N] bool,
#    emitted [N] i32)
# prev/cur are the last two sequence tokens (the draft's pair step re-feeds prev to
# fill the full-accept KV hole, models/speculative.py:_draft_propose); pos is the
# shared token depth — target and draft caches always hold the same positions.


def init_spec_state(config, draft_config, n_slots: int, cache_dtype=jnp.bfloat16):
    return (
        llama.init_kv_cache(config, n_slots, dtype=cache_dtype),
        llama.init_kv_cache(draft_config, n_slots, dtype=cache_dtype),
        jnp.zeros((n_slots,), jnp.int32),
        jnp.zeros((n_slots,), jnp.int32),
        jnp.zeros((n_slots,), jnp.int32),
        jnp.ones((n_slots,), bool),  # empty slots are "done"
        jnp.zeros((n_slots,), jnp.int32),
    )


def _sample_rows(key, logits, temperature, top_k, top_p, min_p):
    """Per-row draft sampling: → (tokens [B] i32, q_probs [B, V] f32). Greedy rows
    take the raw argmax (their q row is never read by the greedy acceptance law)."""
    greedy = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
    f = filter_logits_rows(logits, temperature, top_k, top_p, min_p)
    gumbel = jax.random.gumbel(key, f.shape, jnp.float32)
    sampled = jnp.argmax(f + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature == 0.0, greedy, sampled), jax.nn.softmax(f, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("config", "draft_config", "gamma", "n_rounds", "pad_id"),
    donate_argnums=(4,),
)
def spec_chunk(
    params: Params,
    config: llama.LlamaConfig,
    draft_params: Params,
    draft_config: llama.LlamaConfig,
    state,
    keys: jnp.ndarray,         # [n_rounds] round keys
    temperature: jnp.ndarray,  # [N]
    top_k: jnp.ndarray,        # [N] i32
    top_p: jnp.ndarray,        # [N]
    min_p: jnp.ndarray,        # [N]
    eos_ids: jnp.ndarray,      # [N] i32
    budget: jnp.ndarray,       # [N] i32
    gamma: int,
    n_rounds: int,
    pad_id: int = 0,
):
    """Run ``n_rounds`` speculative rounds over every slot.
    → (tokens [N, n_rounds*(gamma+1)], new state): each live row's new tokens are
    the prefix of its tokens row of length emitted_after - emitted_before (rows
    emit m ∈ [0, gamma+1] per round; the scheduler's prefix-delivery contract)."""
    N = temperature.shape[0]
    W = n_rounds * (gamma + 1)

    def round_body(carry, key):
        t_cache, d_cache, prev, cur, pos, done, emitted, buf, cursor = carry
        d_key, a_key = jax.random.split(key)

        # --- draft: pair step then gamma-1 single steps (per-row positions) ---
        d_keys = jax.random.split(d_key, gamma)
        pair = jnp.stack([prev, cur], axis=1)
        x = jnp.take(draft_params["tok_embeddings"]["weight"], pair, axis=0)
        ppos = pos[:, None] + jnp.arange(-1, 1, dtype=jnp.int32)[None, :]
        mask = MaskInfo(causal=True, q_positions=ppos, kv_len=pos + 1)
        h, d_cache = llama.trunk(draft_params, draft_config, x, mask, d_cache, input_pos=ppos)
        first_tok, first_q = _sample_rows(
            d_keys[0], llama.head(draft_params, draft_config, h[:, -1:, :])[:, 0],
            temperature, top_k, top_p, min_p,
        )

        def d_step(dcarry, step_key):
            d_cache, tok, p = dcarry
            x = jnp.take(draft_params["tok_embeddings"]["weight"], tok[:, None], axis=0)
            mask = MaskInfo(causal=True, q_positions=p[:, None], kv_len=p + 1)
            h, d_cache = llama.trunk(draft_params, draft_config, x, mask, d_cache, input_pos=p[:, None])
            nxt, q_row = _sample_rows(
                step_key, llama.head(draft_params, draft_config, h)[:, 0],
                temperature, top_k, top_p, min_p,
            )
            return (d_cache, nxt, p + 1), (nxt, q_row)

        (d_cache, _, _), (rest, rest_q) = jax.lax.scan(
            d_step, (d_cache, first_tok, pos + 1), d_keys[1:]
        )
        drafts = jnp.concatenate([first_tok[None], rest], axis=0).transpose(1, 0)
        q_probs = jnp.concatenate([first_q[None], rest_q], axis=0).transpose(1, 0, 2)

        # --- target: one verify pass over [cur, d_1..d_gamma] ---
        inputs = jnp.concatenate([cur[:, None], drafts], axis=1)
        x = jnp.take(params["tok_embeddings"]["weight"], inputs, axis=0)
        qpos = pos[:, None] + jnp.arange(gamma + 1, dtype=jnp.int32)[None, :]
        mask = MaskInfo(causal=True, q_positions=qpos, kv_len=pos + gamma + 1)
        h, t_cache = llama.trunk(params, config, x, mask, t_cache, input_pos=qpos)
        t_logits = llama.head(params, config, h)  # [N, gamma+1, V]

        # --- acceptance: both laws, selected per row by its temperature ---
        targets = jnp.argmax(t_logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        match = drafts == targets[:, :gamma]
        a_g = jnp.argmin(
            jnp.concatenate([match, jnp.zeros((N, 1), bool)], axis=1).astype(jnp.int32), axis=1
        )
        rep = lambda v: jnp.repeat(v, gamma + 1, axis=0)
        p_flat = filter_logits_rows(
            t_logits.reshape(N * (gamma + 1), -1),
            rep(temperature), rep(top_k), rep(top_p), rep(min_p),
        )
        p_probs = jax.nn.softmax(p_flat, axis=-1).reshape(t_logits.shape)
        emitted_s, m_s = jax.vmap(speculative_accept)(
            jax.random.split(a_key, N), drafts, q_probs, p_probs
        )
        is_greedy = temperature == 0.0
        emit = jnp.where(is_greedy[:, None], targets, emitted_s)
        m = jnp.where(is_greedy, a_g + 1, m_s)

        # --- freeze / budget / eos bookkeeping (per row, monotone) ---
        m = jnp.where(done, 0, jnp.minimum(m, budget - emitted))
        idx = jnp.arange(gamma + 1)[None, :]
        emit = jnp.where(idx < m[:, None], emit, pad_id)
        live_eos = (emit == eos_ids[:, None]) & (idx < m[:, None])
        hit_eos = jnp.any(live_eos, axis=1)
        eos_cut = jnp.argmax(live_eos, axis=1)
        m = jnp.where(hit_eos, jnp.minimum(m, eos_cut + 1), m)
        emit = jnp.where(idx < m[:, None], emit, pad_id)

        buf = jax.vmap(lambda row, e, s: jax.lax.dynamic_update_slice(row, e, (s,)))(
            buf, emit, cursor
        )
        padded = jnp.concatenate([cur[:, None], emit], axis=1)
        prev = jnp.take_along_axis(padded, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
        cur = jnp.take_along_axis(padded, m[:, None], axis=1)[:, 0]
        emitted = emitted + m
        done = done | hit_eos | (emitted >= budget)
        return (t_cache, d_cache, prev, cur, pos + m, done, emitted, buf, cursor + m), None

    buf0 = jnp.full((N, W), pad_id, jnp.int32)
    carry = (*state, buf0, jnp.zeros((N,), jnp.int32))
    carry, _ = jax.lax.scan(round_body, carry, keys)
    t_cache, d_cache, prev, cur, pos, done, emitted, buf, _ = carry
    return buf, (t_cache, d_cache, prev, cur, pos, done, emitted)


@functools.partial(
    jax.jit, static_argnames=("config", "draft_config", "cache_dtype"), donate_argnums=(4,)
)
def spec_admit_row(
    params: Params,
    config: llama.LlamaConfig,
    draft_params: Params,
    draft_config: llama.LlamaConfig,
    state,
    slot: jnp.ndarray,
    prompt: jnp.ndarray,      # [1, Pb] right-padded to the bucket length
    prompt_len: jnp.ndarray,  # scalar i32
    key: jax.Array,
    sampling: jnp.ndarray,    # [4] f32
    eos_id: jnp.ndarray,
    cache_dtype=jnp.bfloat16,
):
    """Prefill BOTH caches for one prompt row and install it in ``slot``.
    → (first_token, new state). Same pad-overwrite invariant as admit_row; the
    first token is sampled from the TARGET's last-position logits (speculative
    decoding's first emission is always the target's own, models/speculative.py)."""
    t_cache, d_cache, prev, cur, pos, done, emitted = state
    Pb = prompt.shape[1]
    x_pos = jnp.arange(Pb, dtype=jnp.int32)

    def prefill(p, cfg):
        row = llama.init_kv_cache(cfg, 1, dtype=cache_dtype)
        x = jnp.take(p["tok_embeddings"]["weight"], prompt, axis=0)
        h, row = llama.trunk(p, cfg, x, MaskInfo(causal=True), row, input_pos=x_pos, prefill=True)
        return h, row

    h, t_row = prefill(params, config)
    _, d_row = prefill(draft_params, draft_config)
    h_last = jax.lax.dynamic_slice_in_dim(h, prompt_len - 1, 1, axis=1)
    logits = llama.head(params, config, h_last)[:, 0]
    t, k, p, mp = sampling[0], sampling[1], sampling[2], sampling[3]
    first = sample_logits_rows(
        key, logits, t[None], k.astype(jnp.int32)[None], p[None], mp[None]
    )[0]

    t_cache = _scatter_row(t_cache, t_row, slot)
    d_cache = _scatter_row(d_cache, d_row, slot)
    last_tok = jax.lax.dynamic_slice(prompt, (0, prompt_len - 1), (1, 1))[0, 0]
    prev = prev.at[slot].set(last_tok)
    cur = cur.at[slot].set(first)
    pos = pos.at[slot].set(prompt_len.astype(jnp.int32))
    done = done.at[slot].set(first == eos_id)
    emitted = emitted.at[slot].set(1)
    return first, (t_cache, d_cache, prev, cur, pos, done, emitted)


# ---------------------------------------------------------------------------
# host-side scheduler
# ---------------------------------------------------------------------------


class SpeculativeScheduler(ContinuousScheduler):
    """Continuous batching whose chunk step is a speculative round scan.

    ``chunk_size`` counts ROUNDS per dispatch (each round emits 1..gamma+1 tokens
    per live row). Prefix caching and chunked prefill are not yet composed with the
    double-cache admission and are rejected at construction."""

    def __init__(self, params, config, draft_params, draft_config, *, gamma: int = 4,
                 **kw):
        assert not kw.get("prefix_cache") and not kw.get("prefill_chunk"), (
            "speculative continuous batching does not compose with prefix caching / "
            "chunked prefill yet"
        )
        assert config.vocab_size == draft_config.vocab_size, "draft must share the tokenizer"
        self.draft_params, self.draft_config = draft_params, draft_config
        self.gamma = gamma
        self.rounds_run = 0  # acceptance observability: tokens / (rounds * rows)
        super().__init__(params, config, **kw)
        self.state = init_spec_state(config, draft_config, self.n_slots, self.cache_dtype)

    # -- capacity: a round writes target positions up to pos+gamma and draft up to
    # pos+gamma-1; pos <= P + budget - 1 while live, so cap the budget such that
    # P + budget + gamma stays inside BOTH caches.
    def _cap(self) -> int:
        return min(self.config.max_seq_len, self.draft_config.max_seq_len)

    def submit(self, ids, max_tokens: int, sampling=(0.0, 0, 1.0, 0.0),
               eos_id: int = -1, stream_q=None) -> RowHandle:
        need = len(ids) + self.gamma + 1
        if need >= self._cap():
            raise ValueError(
                f"prompt ({len(ids)} tokens) + gamma {self.gamma} fills the "
                f"{self._cap()} cache"
            )
        return super().submit(ids, max_tokens, sampling, eos_id, stream_q)

    def _admit(self, slot: int, row: RowHandle):
        P = len(row.ids)
        Pb = max(self.prompt_multiple, -(-P // self.prompt_multiple) * self.prompt_multiple)
        Pb = min(Pb, self._cap() - 1)
        padded = np.full((1, Pb), self.pad_id, np.int32)
        padded[0, :P] = row.ids
        t, k, p, mp = row.sampling
        first, self.state = spec_admit_row(
            self.params, self.config, self.draft_params, self.draft_config,
            self.state, jnp.asarray(slot, jnp.int32), jnp.asarray(padded),
            jnp.asarray(P, jnp.int32), self._split(),
            jnp.asarray([t, k, p, mp], jnp.float32),
            jnp.asarray(row.eos_id, jnp.int32), cache_dtype=self.cache_dtype,
        )
        self._activate(slot, row, int(first))

    def _budget_cap(self, row: RowHandle) -> int:
        # rounds need gamma+1 positions of headroom in BOTH caches
        return min(row.max_tokens, self._cap() - len(row.ids) - self.gamma)

    def _dispatch_chunk(self):
        keys = jax.random.split(self._split(), self.chunk_size)
        toks, self.state = spec_chunk(
            self.params, self.config, self.draft_params, self.draft_config,
            self.state, keys,
            jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp), jnp.asarray(self.minp),
            jnp.asarray(self.eos), jnp.asarray(self.budget),
            gamma=self.gamma, n_rounds=self.chunk_size, pad_id=self.pad_id,
        )
        self.dispatches += 1
        self.rounds_run += self.chunk_size
        # copies: these leaves are donated into the next dispatch (see base class)
        return toks, self.state[6].copy(), self.state[5].copy()
