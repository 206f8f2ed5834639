"""Speculative decoding: draft-propose / target-verify generation, one compiled
program (static shapes, ``lax.while_loop`` over rounds).

Decode at small batch is weight-bandwidth-bound — every generated token reads every
target weight once. A cheap draft model proposes ``gamma`` tokens autoregressively;
the target then scores ALL of them in ONE forward pass (gamma+1 query positions over
its KV cache — the same MaskInfo decode metadata as single-token decode, just Sq>1),
so accepted tokens amortize one target weight-read over several tokens.

Greedy (temperature == 0): accept the longest prefix with d_i == argmax target(...);
position a (the first mismatch, or the bonus position after a full accept) emits the
target's own t_a — so every round emits a+1 ∈ [1, gamma+1] tokens, all equal to what
target-only greedy decode would produce.

Sampled (temperature > 0): standard speculative REJECTION sampling — draft token
x_i ~ q_i is accepted with probability min(1, p_i(x_i)/q_i(x_i)); the first rejection
resamples from norm(max(p_a - q_a, 0)); a full accept samples the bonus token from
p_gamma. The emitted sequence is distributed EXACTLY as ancestral sampling from the
target (the classic correctness proof; tested empirically on the pure accept step).
p and q are the POST-filter distributions — softmax(filter_logits(...)) with the same
temperature/top_k/top_p on both models, shared with models/generate.py so plain and
speculative sampling agree on what "the target distribution" is.

Cache rollback is free with static full-length caches: rejected positions' K/V stay
in the buffer but ``kv_len`` masking hides them, and the next round overwrites them.

Every step here rides the Pallas decode kernel (ops/decode_attention.py): the
multi-query verify pass (Sq = gamma+1 <= MAX_SQ) and the draft pair step (Sq = 2)
use the kernel's small-Sq form with a per-query causal staircase, so verify cost is
O(kv_len) cache traffic, not O(S_max) dense attention — with ``cache_dtype=int8``
the in-VMEM dequant applies to every pass as well.

The reference has no sampling loop at all (SURVEY.md §3); this is the TPU-native
serving-latency design on top of models/generate.py's prefill+scan machinery.
Batched (B >= 1): per-row acceptance desynchronizes row depths, so positions are
per-row arrays — the cache write becomes a vmapped scatter (models/llama.py
``put``) and RoPE gathers a per-row table (ops/rope.py); rows finished by count
or eos freeze (m = 0) while the rest keep decoding.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import filter_logits, sample_logits
from llama_x_tpu.ops.attention import MaskInfo


def _prefill(params, config, prompt, cache_dtype, prompt_lens=None):
    """Run the prompt through the trunk once, filling the cache.
    -> (cache, per-row last-valid-position logits [B, V], per-row pos [B]).

    ``prompt_lens`` [B] enables RAGGED rows (right-padded to P): the first logits
    gather from each row's own last valid position and pos starts per-row. Pad
    positions' K/V are written too, but every later pass masks kv_pos < its per-query
    window AND overwrites slot pos before the window reaches it — the same argument
    as models/generate.py's ragged decode (pad slots and not-yet-overwritten slots
    coincide exactly)."""
    B, P = prompt.shape
    kv_cache = llama.init_kv_cache(config, B, dtype=cache_dtype)
    x = jnp.take(params["tok_embeddings"]["weight"], prompt, axis=0)
    pos = jnp.arange(P, dtype=jnp.int32)
    h, kv_cache = llama.trunk(params, config, x, MaskInfo(causal=True), kv_cache, input_pos=pos, prefill=True)
    if prompt_lens is None:
        h_last = h[:, -1:, :]
        row_pos = jnp.full((B,), P, jnp.int32)
    else:
        lens = jnp.broadcast_to(prompt_lens.astype(jnp.int32).reshape(-1), (B,))
        h_last = jnp.take_along_axis(h, (lens - 1)[:, None, None], axis=1)
        row_pos = lens
    logits = llama.head(params, config, h_last)
    return kv_cache, logits[:, 0], row_pos


def _draft_propose(params, config, cache, prev, cur, pos, gamma, key, temperature, top_k, top_p, min_p):
    """gamma draft steps. prev/cur/pos [B]. -> (cache, drafts [B, gamma],
    q_probs [B, gamma, V]).

    The FIRST step feeds [prev, cur] (two tokens, per-row positions pos-1 and pos):
    after a full-accept round the draft cache has a one-slot hole at pos-1 — the last
    draft token was sampled from step-gamma logits but never processed, yet the round
    also emitted the bonus token after it. Reprocessing prev fills the hole; in
    non-hole rounds it recomputes an identical KV row (same token, same position,
    same cached prefix), which is harmless.

    Greedy: argmax drafts, q_probs is a placeholder (never read).
    Sampled: drafts ~ q_i = softmax(filter_logits(logits)); q_probs are those rows."""

    def sample(logits, step_key):  # logits [B, V]
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), jnp.zeros_like(logits, jnp.float32)
        f = filter_logits(logits, temperature, top_k, top_p, min_p)
        gumbel = jax.random.gumbel(step_key, f.shape, jnp.float32)
        return jnp.argmax(f + gumbel, axis=-1).astype(jnp.int32), jax.nn.softmax(f, axis=-1)

    keys = jax.random.split(key, gamma)

    # step 1: [prev, cur] pair (fills the potential hole at pos-1)
    pair = jnp.stack([prev, cur], axis=1)  # [B, 2]
    x = jnp.take(params["tok_embeddings"]["weight"], pair, axis=0)
    ppos = pos[:, None] + jnp.arange(-1, 1, dtype=jnp.int32)[None, :]  # [B, 2]
    mask = MaskInfo(causal=True, q_positions=ppos, kv_len=pos + 1)
    h, cache = llama.trunk(params, config, x, mask, cache, input_pos=ppos)
    first_tok, first_q = sample(llama.head(params, config, h[:, -1:, :])[:, 0], keys[0])

    def step(carry, step_key):
        cache, tok, p = carry
        x = jnp.take(params["tok_embeddings"]["weight"], tok[:, None], axis=0)
        mask = MaskInfo(causal=True, q_positions=p[:, None], kv_len=p + 1)
        h, cache = llama.trunk(params, config, x, mask, cache, input_pos=p[:, None])
        nxt, q_row = sample(llama.head(params, config, h)[:, 0], step_key)
        return (cache, nxt, p + 1), (nxt, q_row)

    (cache, _, _), (rest, rest_q) = jax.lax.scan(step, (cache, first_tok, pos + 1), keys[1:])
    drafts = jnp.concatenate([first_tok[None], rest], axis=0).transpose(1, 0)  # [B, gamma]
    q_probs = jnp.concatenate([first_q[None], rest_q], axis=0).transpose(1, 0, 2)  # [B, gamma, V]
    return cache, drafts, q_probs


def _target_verify(params, config, cache, cur, drafts, pos, gamma):
    """One target pass over [cur, d_1..d_gamma] at per-row positions pos..pos+gamma.
    cur/pos [B], drafts [B, gamma]. -> (cache, logits [B, gamma+1, V]) where
    logits[:, i] scores the token AFTER input i (logits[:, gamma] is the bonus
    position following a fully-accepted draft)."""
    inputs = jnp.concatenate([cur[:, None], drafts], axis=1)  # [B, gamma+1]
    x = jnp.take(params["tok_embeddings"]["weight"], inputs, axis=0)
    qpos = pos[:, None] + jnp.arange(gamma + 1, dtype=jnp.int32)[None, :]  # [B, gamma+1]
    mask = MaskInfo(causal=True, q_positions=qpos, kv_len=pos + gamma + 1)
    h, cache = llama.trunk(params, config, x, mask, cache, input_pos=qpos)
    logits = llama.head(params, config, h)  # [B, gamma+1, V]
    return cache, logits


def speculative_accept(key, drafts, q_probs, p_probs):
    """The pure rejection-sampling step (Leviathan/Chen): drafts [gamma] ~ q rows,
    q_probs [gamma, V], p_probs [gamma+1, V] (the target rows; the last is the bonus
    position). -> (emitted [gamma+1], m) with m ∈ [1, gamma+1] valid tokens whose
    joint law is exactly ancestral sampling of p (tested empirically)."""
    gamma = drafts.shape[0]
    u_key, res_key = jax.random.split(key)
    idx = jnp.arange(gamma)
    p_sel = p_probs[idx, drafts]
    q_sel = q_probs[idx, drafts]
    u = jax.random.uniform(u_key, (gamma,))
    accept = u * q_sel < p_sel  # u < p/q without the 0/0 hazard (q>0 at sampled tokens)
    a = jnp.argmin(jnp.concatenate([accept, jnp.asarray([False])]).astype(jnp.int32))
    # position a: first rejection -> resample from norm(relu(p_a - q_a));
    # full accept (a == gamma) -> q row is zeros, residual IS the bonus row p_gamma
    p_a = jax.lax.dynamic_slice_in_dim(p_probs, a, 1, 0)[0]
    q_a = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([q_probs, jnp.zeros_like(q_probs[:1])]), a, 1, 0
    )[0]
    residual = jnp.maximum(p_a - q_a, 0.0)
    correction = jax.random.categorical(res_key, jnp.log(residual)).astype(jnp.int32)
    out_idx = jnp.arange(gamma + 1)
    emitted = jnp.where(
        out_idx < a,
        jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)]),
        jnp.where(out_idx == a, correction, 0),
    )
    return emitted, a + 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "draft_config", "max_new_tokens", "gamma", "eos_id", "pad_id",
        "cache_dtype", "temperature", "top_k", "top_p", "min_p",
    ),
)
def generate_speculative(
    params: dict[str, Any],
    config: llama.LlamaConfig,
    draft_params: dict[str, Any],
    draft_config: llama.LlamaConfig,
    prompt: jnp.ndarray,
    *,
    max_new_tokens: int,
    gamma: int = 4,
    key: jax.Array | None = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    eos_id: int = -1,
    pad_id: int = 0,
    cache_dtype=jnp.bfloat16,
    prompt_lens: jnp.ndarray | None = None,
):
    """prompt [B, P] int32 → (tokens [B, max_new_tokens], stats). ``prompt_lens`` [B]
    enables ragged rows (right-padded to P, per-row real lengths — the serving
    coalescer's batch shape); without it all rows are full length.

    temperature == 0: greedy — the output is the target's own greedy trajectory,
    exactly ``generate(..., temperature=0)`` in the f32 CPU tests. (On TPU bf16 a
    near-tie between the top-2 logits can resolve differently from plain decode,
    because the verify pass batches gamma+1 query positions into one matmul —
    different accumulation order than the Sq=1 decode step; with trained weights the
    trajectories agree.)

    temperature > 0: speculative rejection sampling — emitted tokens are distributed
    exactly as target-only ancestral sampling with the same temperature/top_k/top_p.

    Rows accept at different rates, so positions are per-row; rows that finish (by
    count or eos) freeze while the rest keep decoding — the compiled shape is static.

    ``draft_config`` must share the vocab (same tokenizer).
    stats = {"target_passes": int32, "tokens_emitted": int32 [B]} — mean(tokens /
    B / target_passes) is the measured per-pass acceptance (upper-bounded by
    gamma + 1: a full accept also emits the bonus token sampled at the verify pass's
    last position).
    """
    B, P = prompt.shape
    assert P + max_new_tokens + gamma + 1 <= config.max_seq_len
    assert P + max_new_tokens + gamma <= draft_config.max_seq_len
    if key is None:
        key = jax.random.PRNGKey(0)
    key, first_key = jax.random.split(key)

    t_cache, first_logits, t_pos = _prefill(params, config, prompt, cache_dtype, prompt_lens)
    d_cache, _, d_pos = _prefill(draft_params, draft_config, prompt, cache_dtype, prompt_lens)
    first = sample_logits(first_key, first_logits, temperature, top_k, top_p, min_p)  # [B]

    buf = jnp.full((B, max_new_tokens + gamma + 1), pad_id, jnp.int32)
    buf = buf.at[:, 0].set(first)
    if prompt_lens is None:
        prev0 = prompt[:, -1]  # the token before `first` in each row
    else:
        lens = jnp.broadcast_to(prompt_lens.astype(jnp.int32).reshape(-1), (B,))
        prev0 = jnp.take_along_axis(prompt, (lens - 1)[:, None], axis=1)[:, 0]
    # carry: (t_cache, d_cache, prev, cur, t_pos, d_pos, buf, n_out, done, rounds, key)
    init = (t_cache, d_cache, prev0, first, t_pos, d_pos, buf,
            jnp.ones((B,), jnp.int32), first == eos_id, jnp.asarray(0, jnp.int32), key)

    def cond(carry):
        *_, n_out, done, _, _ = carry
        return jnp.any((n_out < max_new_tokens) & ~done)

    def body(carry):
        t_cache, d_cache, prev, cur, t_pos, d_pos, buf, n_out, done, rounds, key = carry
        key, d_key, a_key = jax.random.split(key, 3)
        d_cache, drafts, q_probs = _draft_propose(
            draft_params, draft_config, d_cache, prev, cur, d_pos, gamma, d_key, temperature, top_k, top_p, min_p
        )
        t_cache, t_logits = _target_verify(params, config, t_cache, cur, drafts, t_pos, gamma)

        if temperature == 0.0:
            targets = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # [B, gamma+1]
            match = drafts == targets[:, :gamma]
            a = jnp.argmin(
                jnp.concatenate([match, jnp.zeros((B, 1), bool)], axis=1).astype(jnp.int32), axis=1
            )
            # emit a accepted drafts (== targets[:, :a]) + the correction-or-bonus
            # targets[:, a]: every emitted token is the target's own greedy choice
            emitted, m = targets, a + 1
        else:
            p_probs = jax.nn.softmax(filter_logits(t_logits, temperature, top_k, top_p, min_p), axis=-1)
            emitted, m = jax.vmap(speculative_accept)(
                jax.random.split(a_key, B), drafts, q_probs, p_probs
            )

        # rows finished by count or eos freeze: emit nothing, positions stay put
        active = (n_out < max_new_tokens) & ~done
        m = jnp.where(active, m, 0)
        idx = jnp.arange(gamma + 1)[None, :]
        emitted = jnp.where(idx < m[:, None], emitted, pad_id)
        if eos_id >= 0:
            live = (emitted == eos_id) & (idx < m[:, None])
            hit_eos = jnp.any(live, axis=1)
            # stop emitting at eos within the round
            eos_cut = jnp.argmax(live, axis=1)
            m = jnp.where(hit_eos, jnp.minimum(m, eos_cut + 1), m)
            emitted = jnp.where(idx < m[:, None], emitted, pad_id)
        else:
            hit_eos = jnp.zeros((B,), bool)

        buf = jax.vmap(lambda row, e, s: jax.lax.dynamic_update_slice(row, e, (s,)))(
            buf, emitted, n_out
        )
        # the new (prev, cur) are the last two sequence tokens: padded[m-1], padded[m]
        # (frozen rows: m=0 -> both stay cur, positions unchanged)
        padded = jnp.concatenate([cur[:, None], emitted], axis=1)  # [B, gamma+2]
        prev = jnp.take_along_axis(padded, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
        cur = jnp.take_along_axis(padded, m[:, None], axis=1)[:, 0]
        return (t_cache, d_cache, prev, cur, t_pos + m, d_pos + m, buf, n_out + m,
                done | hit_eos, rounds + 1, key)

    *_, buf, n_out, done, rounds, _ = jax.lax.while_loop(cond, body, init)

    out = buf[:, :max_new_tokens]
    # pad everything past the first eos (and past n_out, for eos-terminated runs)
    idx = jnp.arange(max_new_tokens)[None, :]
    if eos_id >= 0:
        seen_eos = jnp.cumsum((out == eos_id).astype(jnp.int32), axis=-1)
        after_eos = (seen_eos - (out == eos_id).astype(jnp.int32)) > 0
        out = jnp.where(after_eos, pad_id, out)
    out = jnp.where(idx >= n_out[:, None], pad_id, out)
    return out, {"target_passes": rounds + 1, "tokens_emitted": jnp.minimum(n_out, max_new_tokens)}
