"""Speculative decoding: draft-propose / target-verify greedy generation, one
compiled program (static shapes, ``lax.while_loop`` over rounds).

Decode at small batch is weight-bandwidth-bound — every generated token reads every
target weight once. A cheap draft model proposes ``gamma`` tokens autoregressively;
the target then scores ALL of them in ONE forward pass (gamma query positions over
its KV cache — the same MaskInfo decode metadata as single-token decode, just Sq>1),
so accepted tokens amortize one target weight-read over several tokens. Greedy
verification makes the output EXACTLY the target's own greedy trajectory:

    t_i     = argmax target(prefix + d_1..d_{i-1})    for i = 1..gamma
    accept the longest prefix with d_i == t_i; the first mismatch is REPLACED by the
    target's own t_{a+1} — so every emitted token is what target-only greedy decode
    would have produced, and each round emits between 1 and gamma tokens.

Cache rollback is free with static full-length caches: rejected positions' K/V stay
in the buffer but ``kv_len`` masking hides them, and the next round overwrites them.

The reference has no sampling loop at all (SURVEY.md §3); this is the TPU-native
serving-latency design on top of models/generate.py's prefill+scan machinery.
B=1 (the latency-critical case): per-row acceptance counts would desynchronize
row positions, so batching needs per-row cache scatter — out of scope here.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from llama_x_tpu.models import llama
from llama_x_tpu.ops.attention import MaskInfo


def _prefill(params, config, prompt, cache_dtype):
    """Run the prompt through the trunk once, filling the cache. -> (cache, first_tok, pos)."""
    kv_cache = llama.init_kv_cache(config, 1, dtype=cache_dtype)
    x = jnp.take(params["tok_embeddings"]["weight"], prompt, axis=0)
    P = prompt.shape[1]
    pos = jnp.arange(P, dtype=jnp.int32)
    h, kv_cache = llama.trunk(params, config, x, MaskInfo(causal=True), kv_cache, input_pos=pos, prefill=True)
    logits = llama.head(params, config, h[:, -1:, :])
    first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)  # [1]
    return kv_cache, first, jnp.asarray(P, jnp.int32)


def _draft_propose(params, config, cache, cur, pos, gamma):
    """gamma greedy single-token draft steps. -> (cache, drafts [gamma])."""

    def step(carry, _):
        cache, tok, p = carry
        x = jnp.take(params["tok_embeddings"]["weight"], tok[:, None], axis=0)
        mask = MaskInfo(causal=True, q_positions=p[None, None], kv_len=p[None] + 1)
        h, cache = llama.trunk(params, config, x, mask, cache, input_pos=p[None])
        logits = llama.head(params, config, h)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return (cache, nxt, p + 1), nxt[0]

    (cache, _, _), drafts = jax.lax.scan(step, (cache, cur, pos), length=gamma)
    return cache, drafts


def _target_verify(params, config, cache, cur, drafts, pos, gamma):
    """One target pass over [cur, d_1..d_{gamma-1}] at positions pos..pos+gamma-1.
    -> (cache, targets [gamma]) where targets[i] = greedy next token after input i."""
    inputs = jnp.concatenate([cur, drafts[:-1]])[None, :]  # [1, gamma]
    x = jnp.take(params["tok_embeddings"]["weight"], inputs, axis=0)
    qpos = pos + jnp.arange(gamma, dtype=jnp.int32)
    mask = MaskInfo(causal=True, q_positions=qpos[None, :], kv_len=(pos + gamma)[None])
    h, cache = llama.trunk(params, config, x, mask, cache, input_pos=qpos)
    logits = llama.head(params, config, h)  # [1, gamma, V]
    targets = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [gamma]
    return cache, targets


@functools.partial(
    jax.jit,
    static_argnames=("config", "draft_config", "max_new_tokens", "gamma", "eos_id", "pad_id", "cache_dtype"),
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
    eos_id: int = -1,
    pad_id: int = 0,
    cache_dtype=jnp.bfloat16,
):
    """prompt [1, P] int32 → (tokens [1, max_new_tokens], stats).

    Greedy speculative decoding: the output is the target's own greedy trajectory —
    exactly ``generate(params, config, prompt, temperature=0)`` in the f32 CPU tests.
    On TPU bf16 a near-tie between the top-2 logits can resolve differently from
    plain decode, because the verify pass batches gamma query positions into one
    matmul (different accumulation order than the Sq=1 decode step); with trained
    weights (non-degenerate logit gaps) the trajectories agree. ``draft_config``
    must share the vocab (same tokenizer).
    stats = {"target_passes": int32} — tokens / target_passes is the measured
    per-pass acceptance (upper-bounded by gamma).
    """
    assert prompt.shape[0] == 1, "speculative decode is B=1 (see module docstring)"
    P = prompt.shape[1]
    assert P + max_new_tokens + gamma <= config.max_seq_len
    assert P + max_new_tokens + gamma <= draft_config.max_seq_len

    t_cache, first, t_pos = _prefill(params, config, prompt, cache_dtype)
    d_cache, _, d_pos = _prefill(draft_params, draft_config, prompt, cache_dtype)

    buf = jnp.full((max_new_tokens + gamma,), pad_id, jnp.int32)
    buf = buf.at[0].set(first[0])
    # carry: (t_cache, d_cache, cur, t_pos, d_pos, buf, n_out, done, rounds)
    init = (t_cache, d_cache, first, t_pos, d_pos, buf, jnp.asarray(1, jnp.int32),
            first[0] == eos_id, jnp.asarray(0, jnp.int32))

    def cond(carry):
        *_, n_out, done, _ = carry
        return (n_out < max_new_tokens) & ~done

    def body(carry):
        t_cache, d_cache, cur, t_pos, d_pos, buf, n_out, done, rounds = carry
        d_cache, drafts = _draft_propose(draft_params, draft_config, d_cache, cur, d_pos, gamma)
        t_cache, targets = _target_verify(params, config, t_cache, cur, drafts, t_pos, gamma)

        match = drafts == targets                       # [gamma]
        n_acc = jnp.argmin(jnp.concatenate([match, jnp.asarray([False])]).astype(jnp.int32))
        # emit a+1 tokens on a mismatch (a accepted + the target's correction),
        # gamma on full accept (targets == drafts there, so buf gets the right tokens)
        m = jnp.minimum(n_acc + 1, gamma)

        idx = jnp.arange(gamma)
        emitted = jnp.where(idx < m, targets, pad_id)
        hit_eos = jnp.any((emitted == eos_id) & (idx < m)) if eos_id >= 0 else jnp.asarray(False)
        # stop emitting at eos within the round
        eos_cut = jnp.argmax((emitted == eos_id) & (idx < m)) if eos_id >= 0 else gamma
        m = jnp.where(hit_eos, jnp.minimum(m, eos_cut + 1), m)
        emitted = jnp.where(idx < m, emitted, pad_id)

        buf = jax.lax.dynamic_update_slice(buf, emitted, (n_out,))
        cur = jax.lax.dynamic_slice(emitted, (m - 1,), (1,))  # last emitted token
        return (t_cache, d_cache, cur, t_pos + m, d_pos + m, buf, n_out + m,
                done | hit_eos, rounds + 1)

    *_, buf, n_out, done, rounds = jax.lax.while_loop(cond, body, init)

    out = buf[:max_new_tokens][None, :]
    # pad everything past the first eos (and past n_out, for eos-terminated runs)
    idx = jnp.arange(max_new_tokens)[None, :]
    if eos_id >= 0:
        seen_eos = jnp.cumsum((out == eos_id).astype(jnp.int32), axis=-1)
        after_eos = (seen_eos - (out == eos_id).astype(jnp.int32)) > 0
        out = jnp.where(after_eos, pad_id, out)
    out = jnp.where(idx >= n_out, pad_id, out)
    return out, {"target_passes": rounds + 1, "tokens_emitted": jnp.minimum(n_out, max_new_tokens)}
