"""Static-shape autoregressive decoding (prefill + jitted scan).

The reference ships a KV cache (modelling/llama.py:76-90) and a decode attention path
(llama.py:126-137) but NO sampling loop — SURVEY.md §3 flags this as a fresh TPU design:
everything here is shape-static so the whole generation is ONE compiled program:

- prefill: run the prompt (optionally preceded by modality prefix embeddings — the
  early-fusion audio/image tokens) through the trunk once, scattering K/V into the
  full-length cache; with ``prefix_lm=True`` the modality prefix attends bidirectionally
  (matching prefix-LM training).
- decode: ``lax.scan`` over ``max_new_tokens`` single-token steps; each step embeds the
  previous token, attends over the cache, samples the next token. No Python loop, no
  per-step dispatch, no dynamic shapes.
- sampling: greedy (temperature 0) or temperature + top-k + top-p (nucleus) via
  Gumbel-max on the filtered logits (jax-idiomatic categorical sampling with an
  explicit PRNG key; the nucleus filter is a static-shape sort + prefix-sum).
- eos handling: a ``done`` mask freezes finished rows to ``pad_id`` (the scan is fixed
  length; early exit would make the shape dynamic).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from llama_x_tpu.models import llama
from llama_x_tpu.ops.attention import MaskInfo


def filter_logits(
    logits: jnp.ndarray, temperature: float, top_k: int, top_p: float = 1.0,
    min_p: float = 0.0,
) -> jnp.ndarray:
    """Temperature + top-k + top-p + min-p filtering: [..., V] float logits → f32
    logits with filtered-out tokens at -inf. ``softmax`` of the result IS the
    sampling distribution — shared by the ancestral sampler below and the speculative
    rejection sampler (models/speculative.py), which must agree on it exactly.
    Caller guarantees temperature > 0."""
    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if min_p > 0.0:
        # keep tokens whose probability >= min_p * max probability — in log space
        # a threshold relative to the max logit (softmax-normalizer cancels)
        cutoff = jnp.max(logits, axis=-1, keepdims=True) + jnp.log(min_p)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]  # descending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens where the cumulative mass BEFORE them is < top_p (the nucleus
        # always includes the top token; cum - probs is the exclusive prefix sum)
        keep = (cum - probs) < top_p
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def sample_logits(
    key: jax.Array, logits: jnp.ndarray, temperature: float, top_k: int, top_p: float = 1.0,
    min_p: float = 0.0,
) -> jnp.ndarray:
    """logits [B, V] → token ids [B]. temperature==0 → argmax (key unused).

    The filters compose: top_k truncates first, then min_p drops tokens whose
    probability is below min_p x the top token's, then the smallest set whose
    cumulative probability exceeds top_p survives. Everything is static-shape
    (sort + cumsum + where), so the sampler scans/jits."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = filter_logits(logits, temperature, top_k, top_p, min_p)
    gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "max_new_tokens", "temperature", "top_k", "top_p", "min_p", "eos_id", "pad_id", "cache_dtype", "prefix_lm"
    ),
)
def generate(
    params: dict[str, Any],
    config: llama.LlamaConfig,
    prompt: jnp.ndarray,
    *,
    max_new_tokens: int,
    key: jax.Array | None = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    eos_id: int = -1,
    pad_id: int = 0,
    cache_dtype=jnp.bfloat16,
    prefix_embeds: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    prompt_lens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """prompt [B, P] int32 → generated tokens [B, max_new_tokens].

    prefix_embeds [B, T, D], if given, are early-fusion modality tokens prepended before
    the prompt (audio/image stems); prefix_lm makes them attend bidirectionally. The
    total prefill length + max_new_tokens must fit in config.max_seq_len. Rows that emit
    ``eos_id`` are padded with ``pad_id`` afterwards.

    ``prompt_lens`` [B] enables RAGGED batching: rows are right-padded to P and each
    row's real length is prompt_lens[b]. One prefill covers the batch; each row's
    first token samples from its own last valid position and decode proceeds at
    per-row positions — generated tokens land at slot prompt_lens[b] onward,
    OVERWRITING that row's pad-slot K/V, and the per-row kv_len mask hides any pad
    slot that has not yet been overwritten (they coincide exactly). Each row's output
    equals its own unbatched generate() (tested). Not combinable with prefix_embeds.
    """
    B, P = prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    key_first, key_rest = jax.random.split(key)  # never reuse a consumed key

    x = jnp.take(params["tok_embeddings"]["weight"], prompt, axis=0)
    n_prefix = 0
    if prefix_embeds is not None:
        assert prompt_lens is None, "ragged prompts + modality prefixes not supported"
        n_prefix = prefix_embeds.shape[1]
        x = jnp.concatenate([prefix_embeds.astype(x.dtype), x], axis=1)
    total_p = n_prefix + P
    assert total_p + max_new_tokens <= config.max_seq_len, (total_p, max_new_tokens, config.max_seq_len)

    kv_cache = llama.init_kv_cache(config, B, dtype=cache_dtype)

    # ---- prefill: one pass over prefix + prompt. prefill=True attends over the fresh
    # k/v (the cache is empty, positions start at 0 — identical result) so attention is
    # O(P^2) not O(P * max_seq_len) and runs through the flash kernel. Ragged rows'
    # pad positions are computed too (causal: they never influence valid positions)
    # and their cache slots are later overwritten by that row's generated tokens ----
    pos = jnp.arange(total_p, dtype=jnp.int32)
    mask = MaskInfo(
        causal=True,
        prefix_len=jnp.full((B,), n_prefix, jnp.int32) if (prefix_lm and n_prefix) else None,
    )
    h, kv_cache = llama.trunk(params, config, x, mask, kv_cache, input_pos=pos, prefill=True)
    if prompt_lens is None:
        h_last = h[:, -1:, :]
    else:
        lens = jnp.broadcast_to(prompt_lens.astype(jnp.int32).reshape(-1), (B,))
        h_last = jnp.take_along_axis(h, (lens - 1)[:, None, None], axis=1)
    logits = llama.head(params, config, h_last)
    first = sample_logits(key_first, logits[:, 0], temperature, top_k, top_p, min_p)

    # ---- decode: fixed-length scan of single-token steps. pos is scalar (uniform
    # rows) or [B] (ragged — per-row cache scatter + rope, models/llama.py put()) ----
    ragged = prompt_lens is not None

    def step(carry, step_key):
        kv_cache, tok, pos, done = carry
        x = jnp.take(params["tok_embeddings"]["weight"], tok[:, None], axis=0)
        if ragged:
            mask = MaskInfo(causal=True, q_positions=pos[:, None], kv_len=pos + 1)
            input_pos = pos[:, None]
        else:
            mask = MaskInfo(causal=True, q_positions=pos[None, None], kv_len=pos[None] + 1)
            input_pos = pos[None]
        h, kv_cache = llama.trunk(params, config, x, mask, kv_cache, input_pos=input_pos)
        logits = llama.head(params, config, h)
        nxt = sample_logits(step_key, logits[:, 0], temperature, top_k, top_p, min_p)
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        return (kv_cache, nxt, pos + 1, done), nxt

    done0 = first == eos_id
    keys = jax.random.split(key_rest, max_new_tokens)
    pos0 = lens if ragged else jnp.asarray(total_p, jnp.int32)
    init = (kv_cache, first, pos0, done0)
    if max_new_tokens > 1:
        _, rest = jax.lax.scan(step, init, keys[:-1])
        out = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        out = first[:, None]
    return out


# ---------------------------------------------------------------------------
# Chunked decoding: the same decode law as generate(), split into resumable
# compiled pieces so a host loop can (a) STREAM tokens as they appear and
# (b) STOP EARLY once every row hit eos / a stop sequence — generate() is one
# fused program that always pays all max_new_tokens steps. Token-for-token
# parity with generate() is pinned by tests: prefill_start consumes the same
# first key, and the caller feeds the same split-upfront key schedule into
# decode_chunk slices.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "temperature", "top_k", "top_p", "min_p", "eos_id", "cache_dtype", "prefix_lm"
    ),
)
def prefill_start(
    params: dict[str, Any],
    config: llama.LlamaConfig,
    prompt: jnp.ndarray,
    *,
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    eos_id: int = -1,
    cache_dtype=jnp.bfloat16,
    prefix_embeds: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    prompt_lens: jnp.ndarray | None = None,
):
    """Prefill + sample the first token. -> (first [B], decode state).

    The state pytree is (kv_cache, last_token [B], pos, done [B]); ``pos`` is a
    scalar for uniform batches or [B] for ragged ones (``prompt_lens`` given) —
    pass it straight to decode_chunk, whose donated buffers make the host loop
    allocation-free between chunks. ``key`` here must be the FIRST of the
    split-upfront schedule (see generate_stream) for parity with generate()."""
    B, P = prompt.shape
    x = jnp.take(params["tok_embeddings"]["weight"], prompt, axis=0)
    n_prefix = 0
    if prefix_embeds is not None:
        assert prompt_lens is None, "ragged prompts + modality prefixes not supported"
        n_prefix = prefix_embeds.shape[1]
        x = jnp.concatenate([prefix_embeds.astype(x.dtype), x], axis=1)
    total_p = n_prefix + P

    kv_cache = llama.init_kv_cache(config, B, dtype=cache_dtype)
    pos = jnp.arange(total_p, dtype=jnp.int32)
    mask = MaskInfo(
        causal=True,
        prefix_len=jnp.full((B,), n_prefix, jnp.int32) if (prefix_lm and n_prefix) else None,
    )
    h, kv_cache = llama.trunk(params, config, x, mask, kv_cache, input_pos=pos, prefill=True)
    if prompt_lens is None:
        h_last = h[:, -1:, :]
        pos0 = jnp.asarray(total_p, jnp.int32)
    else:
        lens = jnp.broadcast_to(prompt_lens.astype(jnp.int32).reshape(-1), (B,))
        h_last = jnp.take_along_axis(h, (lens - 1)[:, None, None], axis=1)
        pos0 = lens
    logits = llama.head(params, config, h_last)
    first = sample_logits(key, logits[:, 0], temperature, top_k, top_p, min_p)
    return first, (kv_cache, first, pos0, first == eos_id)


@functools.partial(
    jax.jit,
    static_argnames=("config", "temperature", "top_k", "top_p", "min_p", "eos_id", "pad_id"),
    donate_argnums=(2,),
)
def decode_chunk(
    params: dict[str, Any],
    config: llama.LlamaConfig,
    state,
    keys: jnp.ndarray,
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    eos_id: int = -1,
    pad_id: int = 0,
):
    """Run ``len(keys)`` decode steps from ``state``. -> (tokens [B, n], new state).

    ``state`` is donated: the KV cache updates in place across chunks (the host
    loop must drop its old reference, which the generate_stream generator does)."""
    kv_cache, tok, pos, done = state
    ragged = pos.ndim == 1

    def step(carry, step_key):
        kv_cache, tok, pos, done = carry
        x = jnp.take(params["tok_embeddings"]["weight"], tok[:, None], axis=0)
        if ragged:
            mask = MaskInfo(causal=True, q_positions=pos[:, None], kv_len=pos + 1)
            input_pos = pos[:, None]
        else:
            mask = MaskInfo(causal=True, q_positions=pos[None, None], kv_len=pos[None] + 1)
            input_pos = pos[None]
        h, kv_cache = llama.trunk(params, config, x, mask, kv_cache, input_pos=input_pos)
        logits = llama.head(params, config, h)
        nxt = sample_logits(step_key, logits[:, 0], temperature, top_k, top_p, min_p)
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        return (kv_cache, nxt, pos + 1, done), nxt

    state, toks = jax.lax.scan(step, (kv_cache, tok, pos, done), keys)
    return toks.T, state


def generate_stream(
    params: dict[str, Any],
    config: llama.LlamaConfig,
    prompt: jnp.ndarray,
    *,
    max_new_tokens: int,
    chunk_size: int = 16,
    key: jax.Array | None = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    eos_id: int = -1,
    pad_id: int = 0,
    cache_dtype=jnp.bfloat16,
    prefix_embeds: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    prompt_lens: jnp.ndarray | None = None,
):
    """Yield token blocks [B, <=chunk_size] as they decode; early-exits once every
    row is done. ``concatenate(blocks)[:, :max_new_tokens]`` equals generate() with
    the same arguments up to the position where all rows finished (beyond it
    generate() also only emits pad_id) — the key schedule is identical by
    construction. Last chunk may be short; chunks after all-done are not run."""
    if key is None:
        key = jax.random.PRNGKey(0)
    key_first, key_rest = jax.random.split(key)
    sample_kw = dict(temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p)

    first, state = prefill_start(
        params, config, prompt, key=key_first, eos_id=eos_id, cache_dtype=cache_dtype,
        prefix_embeds=prefix_embeds, prefix_lm=prefix_lm, prompt_lens=prompt_lens,
        **sample_kw,
    )
    yield first[:, None]
    import numpy as np

    if max_new_tokens <= 1:
        return
    keys = jax.random.split(key_rest, max_new_tokens)[:-1]  # generate()'s schedule
    at = 0
    while at < len(keys):
        if bool(np.asarray(state[3]).all()):  # every row finished — skip the rest
            return
        n = min(chunk_size, len(keys) - at)
        toks, state = decode_chunk(
            params, config, state, keys[at : at + n], eos_id=eos_id, pad_id=pad_id,
            **sample_kw,
        )
        yield toks
        at += n
