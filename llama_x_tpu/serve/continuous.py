"""Continuous batching: rows join and leave the running decode batch at chunk
boundaries.

The reference has no serving stack at all (SURVEY §3 — modelling/llama.py stops at
the KV cache); the coalescing engine in tools/serve_http.py batches requests that
arrive in the same window but makes late arrivals wait for the whole batch to
finish. This is the TPU-native fix, the same scheduling idea as vLLM's continuous
batching but redesigned for XLA's compilation model — no dynamic batch, no paging,
no per-step dispatch:

- ONE persistent decode state over a fixed number of slots (the compiled batch
  dimension). The KV cache is [L, n_slots, Hkv, S_max, hd] and is DONATED through
  every dispatch, so the whole serving loop runs allocation-free in steady state.
- Admission is a jitted single-row prefill into a fresh [L, 1, ...] cache that is
  then scattered into the slot's lane of the shared cache (dynamic_update_slice on
  the donated buffer = in-place write). One compile per prompt-length bucket.
- Decoding is the resumable chunk scan (models/generate.py decode_chunk's law) with
  every per-request quantity traced as a [n_slots] array: sampling params
  (temperature / top-k / top-p / min-p), eos id (chat eot vs plain eos can share a
  batch), token budget, and the done mask. Nothing about a new request's sampling
  config or max_tokens triggers a recompile — the compiled-program count is
  O(prompt buckets) + 1, regardless of traffic.
- Between chunks the host appends each row's new tokens (the freeze mask is
  monotone, so a row's valid tokens are a chunk-local PREFIX of length
  emitted_after - emitted_before), streams deltas, frees finished slots, and admits
  queued rows into them.

Per-row isolation makes this exact: attention, RoPE, and the cache scatter are all
row-local, so a row's greedy output is identical to an unbatched generate() of the
same prompt no matter what traffic shares its batch (pinned by tests).
"""

from __future__ import annotations

import functools
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.ops.attention import MaskInfo

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# per-row sampling: the [B]-vectorized form of generate.sample_logits. For rows
# with identical scalar params both paths draw the SAME token from the same key
# (same filter math, same gumbel draw) — pinned by tests.
# ---------------------------------------------------------------------------


def filter_logits_rows(
    logits: jnp.ndarray,
    temperature: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    min_p: jnp.ndarray,
) -> jnp.ndarray:
    """generate.filter_logits with per-row thresholds: [B, V] f32 filtered logits
    (softmax of a row == that row's sampling distribution). Order matches the
    scalar path exactly: top-k truncates (k=0 → keep all), min-p relative to the
    row max, then the nucleus keeps the smallest prefix whose mass exceeds top_p."""
    B, V = logits.shape
    l = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)[:, None]
    # top-k: per-row k-th largest as the threshold (sort replaces lax.top_k — k is traced)
    desc = jnp.sort(l, axis=-1)[:, ::-1]
    k = jnp.clip(jnp.where(top_k > 0, top_k, V), 1, V).astype(jnp.int32)
    kth = jnp.take_along_axis(desc, (k - 1)[:, None], axis=-1)
    l = jnp.where(l < kth, -jnp.inf, l)
    # min-p: log-space threshold relative to the row max (normalizer cancels)
    cutoff = jnp.max(l, axis=-1, keepdims=True) + jnp.log(jnp.clip(min_p, 1e-12, 1.0))[:, None]
    l = jnp.where((min_p > 0.0)[:, None] & (l < cutoff), -jnp.inf, l)
    # top-p over the already-filtered logits (generate.filter_logits order)
    desc = jnp.sort(l, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p[:, None]  # exclusive prefix: top token always kept
    cutoff = jnp.min(jnp.where(keep, desc, jnp.inf), axis=-1, keepdims=True)
    l = jnp.where((top_p < 1.0)[:, None] & (l < cutoff), -jnp.inf, l)
    return l


def sample_logits_rows(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    min_p: jnp.ndarray,
) -> jnp.ndarray:
    """logits [B, V] + per-row params [B] → token ids [B]; temperature==0 rows argmax
    of the RAW logits (exactly the scalar sampler's greedy branch)."""
    greedy = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
    l = filter_logits_rows(logits, temperature, top_k, top_p, min_p)
    gumbel = jax.random.gumbel(key, l.shape, jnp.float32)
    sampled = jnp.argmax(l + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature == 0.0, greedy, sampled)


# ---------------------------------------------------------------------------
# device programs: slot admission + the chunked multi-row decode step
# ---------------------------------------------------------------------------
# state pytree (dtypes must stay IDENTICAL across dispatches — donation aliasing):
#   (kv_cache, tok [B] i32, pos [B] i32, done [B] bool, emitted [B] i32)


def init_state(config: llama.LlamaConfig, n_slots: int, cache_dtype=jnp.bfloat16):
    return (
        llama.init_kv_cache(config, n_slots, dtype=cache_dtype),
        jnp.zeros((n_slots,), jnp.int32),
        jnp.zeros((n_slots,), jnp.int32),
        jnp.ones((n_slots,), bool),  # empty slots are "done"
        jnp.zeros((n_slots,), jnp.int32),
    )


def _scatter_row(big_cache, row_cache, slot):
    """Write a [L, 1, ...] single-row cache into lane ``slot`` of the shared cache.
    Works on both cache forms (bf16 arrays / int8 (data, scale) tuples): every leaf
    has the batch at axis 1."""
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(
            b, s.astype(b.dtype), (0, slot) + (0,) * (b.ndim - 2)
        ),
        big_cache, row_cache,
    )


@functools.partial(jax.jit, static_argnames=("config", "cache_dtype"), donate_argnums=(2,))
def admit_row(
    params: Params,
    config: llama.LlamaConfig,
    state,
    slot: jnp.ndarray,
    prompt: jnp.ndarray,      # [1, Pb] right-padded to the bucket length
    prompt_len: jnp.ndarray,  # scalar i32: the row's real length
    key: jax.Array,
    sampling: jnp.ndarray,    # [4] f32: temperature, top_k, top_p, min_p
    eos_id: jnp.ndarray,      # scalar i32
    cache_dtype=jnp.bfloat16,
):
    """Prefill one prompt row and install it in ``slot``. → (first_token, new state).

    Compiles once per prompt bucket Pb; slot / lengths / sampling are all traced.
    Pad positions beyond prompt_len are computed too (causal: they never influence
    valid positions) and their stale cache rows are overwritten by this row's
    generated tokens before the advancing kv_len window can expose them — the same
    invariant as ragged generate() (models/generate.py)."""
    kv_cache, tok, pos, done, emitted = state

    x = jnp.take(params["tok_embeddings"]["weight"], prompt, axis=0)
    Pb = prompt.shape[1]
    row_cache = llama.init_kv_cache(config, 1, dtype=cache_dtype)
    h, row_cache = llama.trunk(
        params, config, x, MaskInfo(causal=True), row_cache,
        input_pos=jnp.arange(Pb, dtype=jnp.int32), prefill=True,
    )
    h_last = jax.lax.dynamic_slice_in_dim(h, prompt_len - 1, 1, axis=1)
    logits = llama.head(params, config, h_last)[:, 0]  # [1, V]
    t, k, p, mp = sampling[0], sampling[1], sampling[2], sampling[3]
    first = sample_logits_rows(
        key, logits, t[None], k.astype(jnp.int32)[None], p[None], mp[None]
    )[0]

    kv_cache = _scatter_row(kv_cache, row_cache, slot)
    tok = tok.at[slot].set(first)
    pos = pos.at[slot].set(prompt_len.astype(jnp.int32))
    done = done.at[slot].set(first == eos_id)
    emitted = emitted.at[slot].set(1)
    return first, (kv_cache, tok, pos, done, emitted)


@functools.partial(jax.jit, static_argnames=("config", "cache_dtype"), donate_argnums=(2,))
def admit_row_prefix(
    params: Params,
    config: llama.LlamaConfig,
    state,
    slot: jnp.ndarray,
    prefix_kv,                # cache tree sliced to [L, 1, Hkv, P0, (hd)] — a harvested prefix
    prefix_len: jnp.ndarray,  # scalar i32 == P0 (the slice width; traced for positions)
    suffix: jnp.ndarray,      # [1, Sb] right-padded suffix (the tokens after the prefix)
    suffix_len: jnp.ndarray,  # scalar i32: the suffix's real length (>= 1)
    key: jax.Array,
    sampling: jnp.ndarray,
    eos_id: jnp.ndarray,
    cache_dtype=jnp.bfloat16,
):
    """Admit a row whose first ``prefix_len`` tokens already have cached KV: install
    the prefix KV and prefill ONLY the suffix against it. → (first_token, new state).

    Causality makes prefix KV reusable verbatim: k/v at position i depend only on
    tokens <= i, so any prompt sharing those tokens computes the identical values —
    this skips the prefix's trunk GEMMs and attention entirely (the TTFT win for
    shared system prompts). The suffix runs through the decode-from-cache path
    (models/llama.py attention, prefill=False): fresh k/v scatter in at positions
    [P0, P0+Sb) and queries attend over the whole row cache under the causal
    q_positions/kv_len oracle — for Sb > 8 that is the XLA fallback's O(Sb * S_max)
    masked attention, which only touches the admission, never the decode loop.
    Compiles once per (P0, Sb) pair; P0 is bucket-aligned by the harvest policy so
    the pair count stays O(prompt buckets^2) with ~one live system prompt in practice.
    """
    kv_cache, tok, pos, done, emitted = state
    row_cache = llama.init_kv_cache(config, 1, dtype=cache_dtype)
    row_cache = jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(b, s.astype(b.dtype), (0,) * b.ndim),
        row_cache, prefix_kv,
    )
    Sb = suffix.shape[1]
    x = jnp.take(params["tok_embeddings"]["weight"], suffix, axis=0)
    qpos = prefix_len.astype(jnp.int32) + jnp.arange(Sb, dtype=jnp.int32)
    total = (prefix_len + suffix_len).astype(jnp.int32)
    mask = MaskInfo(causal=True, q_positions=qpos[None, :], kv_len=total[None])
    h, row_cache = llama.trunk(params, config, x, mask, row_cache, input_pos=qpos)
    h_last = jax.lax.dynamic_slice_in_dim(h, suffix_len - 1, 1, axis=1)
    logits = llama.head(params, config, h_last)[:, 0]
    t, k, p, mp = sampling[0], sampling[1], sampling[2], sampling[3]
    first = sample_logits_rows(
        key, logits, t[None], k.astype(jnp.int32)[None], p[None], mp[None]
    )[0]

    kv_cache = _scatter_row(kv_cache, row_cache, slot)
    tok = tok.at[slot].set(first)
    pos = pos.at[slot].set(total)
    done = done.at[slot].set(first == eos_id)
    emitted = emitted.at[slot].set(1)
    return first, (kv_cache, tok, pos, done, emitted)


@functools.partial(jax.jit, static_argnames=("config", "first"), donate_argnums=(2,))
def prefill_chunk(
    params: Params,
    config: llama.LlamaConfig,
    row_cache,
    chunk: jnp.ndarray,      # [1, C] fixed-width slice of the prompt (last one padded)
    start: jnp.ndarray,      # scalar i32: position of chunk[0]
    n_valid: jnp.ndarray,    # scalar i32: real tokens in this chunk (== C except last)
    first: bool,
):
    """One chunk of an incremental prefill into a single-row cache. → (row_cache,
    h_last [1, 1, D]) where h_last is the hidden state at the chunk's last VALID
    position (the host uses it only on the final chunk, to sample the first token).

    ``first`` (static): position-0 chunks attend over their fresh K/V on the flash
    path (admit_row's O(C^2) form); continuation chunks attend over the whole row
    cache under the causal q_positions/kv_len oracle (admit_row_prefix's form).
    Junk K/V from the last chunk's pad positions lands at [start+n_valid, start+C)
    — beyond the prompt, where the decode loop overwrites each lane on the exact
    step it first becomes visible (the ragged-generate invariant).

    Fixed chunk width means exactly TWO executables per admission engine regardless
    of traffic (first / continuation), and the device is never held longer than one
    chunk's prefill — co-tenants get a decode chunk between every pair of prefill
    chunks (bounded ITL; the whole point vs one O(P) admission dispatch)."""
    x = jnp.take(params["tok_embeddings"]["weight"], chunk, axis=0)
    C = chunk.shape[1]
    if first:
        mask = MaskInfo(causal=True)
        h, row_cache = llama.trunk(
            params, config, x, mask, row_cache,
            input_pos=jnp.arange(C, dtype=jnp.int32), prefill=True,
        )
    else:
        qpos = start.astype(jnp.int32) + jnp.arange(C, dtype=jnp.int32)
        mask = MaskInfo(causal=True, q_positions=qpos[None, :], kv_len=(start + n_valid)[None])
        h, row_cache = llama.trunk(params, config, x, mask, row_cache, input_pos=qpos)
    h_last = jax.lax.dynamic_slice_in_dim(h, n_valid - 1, 1, axis=1)
    return row_cache, h_last


@functools.partial(jax.jit, static_argnames=("config",))
def sample_first(params: Params, config: llama.LlamaConfig, h_last, key, sampling):
    logits = llama.head(params, config, h_last)[:, 0]
    t, k, p, mp = sampling[0], sampling[1], sampling[2], sampling[3]
    return sample_logits_rows(
        key, logits, t[None], k.astype(jnp.int32)[None], p[None], mp[None]
    )[0]


@functools.partial(jax.jit, donate_argnums=(0,))
def install_row(state, slot, row_cache, first, total, eos_id):
    """Scatter a fully prefilled row cache into lane ``slot`` and mark it live."""
    kv_cache, tok, pos, done, emitted = state
    kv_cache = _scatter_row(kv_cache, row_cache, slot)
    tok = tok.at[slot].set(first)
    pos = pos.at[slot].set(total.astype(jnp.int32))
    done = done.at[slot].set(first == eos_id)
    emitted = emitted.at[slot].set(1)
    return kv_cache, tok, pos, done, emitted


@functools.partial(jax.jit, donate_argnums=(0,))
def _seed_prefix(row_cache, prefix_kv):
    """Install a harvested prefix tree at positions [0, P0) of a fresh row cache."""
    return jax.tree.map(
        lambda b, s: jax.lax.dynamic_update_slice(b, s.astype(b.dtype), (0,) * b.ndim),
        row_cache, prefix_kv,
    )


@functools.partial(jax.jit, static_argnames=("p0",))
def _slice_prefix(kv_cache, slot: jnp.ndarray, p0: int):
    """Read lane ``slot``'s first ``p0`` cache positions out of the shared cache as a
    [L, 1, Hkv, p0, (hd)] tree (both cache forms; position axis is 3 on every leaf)."""
    def leaf(b):
        sizes = tuple(1 if i == 1 else (p0 if i == 3 else s) for i, s in enumerate(b.shape))
        starts = (0, slot) + (0,) * (b.ndim - 2)
        return jax.lax.dynamic_slice(b, starts, sizes)

    return jax.tree.map(leaf, kv_cache)


@functools.partial(jax.jit, static_argnames=("config", "pad_id"), donate_argnums=(2,))
def decode_rows(
    params: Params,
    config: llama.LlamaConfig,
    state,
    keys: jnp.ndarray,        # [n, key]: one per step
    temperature: jnp.ndarray,  # [B]
    top_k: jnp.ndarray,        # [B] i32
    top_p: jnp.ndarray,        # [B]
    min_p: jnp.ndarray,        # [B]
    eos_ids: jnp.ndarray,      # [B] i32 (per-row stop token: chat eot vs eos)
    budget: jnp.ndarray,       # [B] i32: per-row max_new_tokens
    pad_id: int = 0,
):
    """Run ``len(keys)`` decode steps over every slot. → (tokens [B, n], new state).

    A row freezes (monotonically) when it emits its eos, exhausts its budget, or
    fills the cache; frozen and empty slots ride along emitting pad_id (their lanes
    are dead weight in the batched GEMMs — the price of a static batch, recovered by
    admitting new rows into them at the next boundary)."""
    S_max = config.max_seq_len

    def step(carry, step_key):
        kv_cache, tok, pos, done, emitted = carry
        x = jnp.take(params["tok_embeddings"]["weight"], tok[:, None], axis=0)
        mask = MaskInfo(causal=True, q_positions=pos[:, None], kv_len=pos + 1)
        h, kv_cache = llama.trunk(params, config, x, mask, kv_cache, input_pos=pos[:, None])
        logits = llama.head(params, config, h)[:, 0]
        nxt = sample_logits_rows(step_key, logits, temperature, top_k, top_p, min_p)
        nxt = jnp.where(done, pad_id, nxt)
        emitted = emitted + jnp.where(done, 0, 1)
        # frozen/empty lanes hold position: their attention window must not grow
        # toward S_max (the decode kernel reads O(kv_len) — dead lanes would other-
        # wise stream the whole zero cache). Live rows never hit the clamp (the
        # capacity freeze below fires first).
        new_pos = jnp.where(done, pos, jnp.minimum(pos + 1, S_max - 1))
        done = done | (nxt == eos_ids) | (emitted >= budget) | (pos + 1 >= S_max)
        return (kv_cache, nxt, new_pos, done, emitted), nxt

    state, toks = jax.lax.scan(step, state, keys)
    return toks.T, state


# ---------------------------------------------------------------------------
# host-side scheduler
# ---------------------------------------------------------------------------


class RowHandle:
    """One prompt row moving through the scheduler. ``event`` fires when the row is
    finished; ``stream_q`` (optional queue.Queue) receives token-id lists per chunk
    and a ``None`` sentinel at the end."""

    def __init__(self, ids: list[int], max_tokens: int, sampling, eos_id: int, stream_q=None):
        assert max_tokens >= 1
        self.ids = ids
        self.max_tokens = max_tokens
        self.sampling = sampling  # (temperature, top_k, top_p, min_p)
        self.eos_id = eos_id
        self.stream_q = stream_q
        self.tokens: list[int] = []   # raw emissions, eos included
        self.event = threading.Event()
        self.error: Exception | None = None

    @property
    def finish_reason(self) -> str:
        return "stop" if (self.tokens and self.tokens[-1] == self.eos_id) else "length"


class _Admitting:
    """A slot mid-way through a chunked prefill (prefill_chunk > 0): its private
    row cache plus the next prompt position to run."""

    def __init__(self, row: RowHandle, cache, start: int):
        self.row, self.cache, self.next = row, cache, start


class ContinuousScheduler:
    """Admit-between-chunks serving loop over a fixed slot array.

    submit() is thread-safe and non-blocking; a worker thread owns the device state
    and runs: admit queued rows into free slots → advance one prefill chunk per
    admitting slot (chunked-prefill mode) → decode one chunk over all slots →
    deliver tokens / free finished slots → repeat (sleeping when fully idle).
    """

    def __init__(
        self,
        params: Params,
        config: llama.LlamaConfig,
        *,
        n_slots: int = 8,
        chunk_size: int = 16,
        prompt_multiple: int = 64,
        cache_dtype=jnp.bfloat16,
        pad_id: int = 0,
        seed: int = 0,
        prefix_cache: int = 0,
        prefill_chunk: int = 0,
    ):
        self.params, self.config = params, config
        self.n_slots, self.chunk_size = n_slots, chunk_size
        self.prompt_multiple = prompt_multiple
        self.cache_dtype, self.pad_id = cache_dtype, pad_id
        # chunked prefill (prefill_chunk = chunk width in tokens, 0 = off): an
        # admission never holds the device longer than one chunk — long prompts
        # prefill incrementally, interleaved with everyone else's decode chunks
        # (bounded inter-token latency for co-tenants instead of a head-of-line
        # O(P) prefill stall). Also caps executables at TWO per admission engine
        # (first/continuation chunk) instead of one per prompt bucket.
        self.prefill_chunk = prefill_chunk
        self.admitting: dict[int, _Admitting] = {}
        self.prefill_dispatches = 0
        # automatic prefix caching (prefix_cache = max cached entries, 0 = off):
        # after each admission the prompt's longest bucket-aligned PROPER prefix
        # [0, P0) is sliced out of the slot's cache lane and registered under its
        # token ids; a later prompt starting with those exact tokens admits through
        # admit_row_prefix (prefill cost O(suffix), not O(prompt)). Worker-thread
        # only — no lock. Values: (cache tree, P0, lru counter).
        self.prefix_cap = prefix_cache
        self.prefixes: dict[tuple[int, ...], list] = {}
        self._lru = 0
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0
        self.state = init_state(config, n_slots, cache_dtype)
        self.key = jax.random.PRNGKey(seed)
        # host mirrors of the per-slot row metadata fed to decode_rows each chunk
        self.temp = np.zeros(n_slots, np.float32)
        self.topk = np.zeros(n_slots, np.int32)
        self.topp = np.ones(n_slots, np.float32)
        self.minp = np.zeros(n_slots, np.float32)
        self.eos = np.full(n_slots, -1, np.int32)
        self.budget = np.ones(n_slots, np.int32)
        self.emitted_seen = np.zeros(n_slots, np.int64)  # host copy of emitted
        self.rows: list[RowHandle | None] = [None] * n_slots
        self.queue: list[RowHandle] = []
        self.cond = threading.Condition()
        self.dispatches = 0  # chunks run (observability / tests)
        self.admissions = 0
        self.dead: Exception | None = None
        self._stop = False
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()

    # -- client side ---------------------------------------------------------

    def submit(self, ids: list[int], max_tokens: int, sampling=(0.0, 0, 1.0, 0.0),
               eos_id: int = -1, stream_q=None) -> RowHandle:
        cap = self.config.max_seq_len
        if len(ids) + 1 > cap:
            raise ValueError(f"prompt ({len(ids)} tokens) fills the {cap} cache")
        row = RowHandle(list(ids), max_tokens, tuple(sampling), eos_id, stream_q)
        with self.cond:
            if self.dead is not None:
                raise RuntimeError("scheduler worker died") from self.dead
            self.queue.append(row)
            self.cond.notify()
        return row

    def close(self):
        with self.cond:
            self._stop = True
            self.cond.notify()
        self.worker.join(timeout=30)

    # -- worker side ---------------------------------------------------------

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _match_prefix(self, ids: list[int]) -> tuple[int, ...] | None:
        """Longest registered key that is a PROPER prefix of ids (>= 1 suffix token
        must remain — the admission needs a last position to sample from)."""
        best = None
        for key in self.prefixes:
            n = len(key)
            if n < len(ids) and (best is None or n > len(best)) and tuple(ids[:n]) == key:
                best = key
        return best

    def _harvest_prefix(self, slot: int, ids: list[int]):
        """Register the prompt's longest bucket-aligned proper prefix from the
        freshly admitted slot lane (valid: admission wrote positions [0, P))."""
        p0 = (len(ids) - 1) // self.prompt_multiple * self.prompt_multiple
        if p0 < self.prompt_multiple:
            return
        key = tuple(ids[:p0])
        self._lru += 1
        if key in self.prefixes:
            self.prefixes[key][2] = self._lru
            return
        tree = _slice_prefix(self.state[0], jnp.asarray(slot, jnp.int32), p0)
        self.prefixes[key] = [tree, p0, self._lru]
        while len(self.prefixes) > self.prefix_cap:
            oldest = min(self.prefixes, key=lambda k: self.prefixes[k][2])
            del self.prefixes[oldest]

    def _admit(self, slot: int, row: RowHandle):
        P = len(row.ids)
        t, k, p, mp = row.sampling
        common = dict(cache_dtype=self.cache_dtype)
        args = (
            self.params, self.config, self.state, jnp.asarray(slot, jnp.int32),
        )
        hit = self._match_prefix(row.ids) if self.prefix_cap else None
        if hit is not None:
            tree, p0, _ = self.prefixes[hit]
            self.prefixes[hit][2] = self._lru = self._lru + 1
            suf = row.ids[p0:]
            Sb = -(-len(suf) // self.prompt_multiple) * self.prompt_multiple
            Sb = min(Sb, self.config.max_seq_len - p0)
            padded = np.full((1, Sb), self.pad_id, np.int32)
            padded[0, : len(suf)] = suf
            first, self.state = admit_row_prefix(
                *args, tree, jnp.asarray(p0, jnp.int32), jnp.asarray(padded),
                jnp.asarray(len(suf), jnp.int32), self._split(),
                jnp.asarray([t, k, p, mp], jnp.float32),
                jnp.asarray(row.eos_id, jnp.int32), **common,
            )
            self.prefix_hits += 1
            self.prefix_tokens_reused += p0
        else:
            Pb = max(self.prompt_multiple, -(-P // self.prompt_multiple) * self.prompt_multiple)
            Pb = min(Pb, self.config.max_seq_len - 1)
            padded = np.full((1, Pb), self.pad_id, np.int32)
            padded[0, :P] = row.ids
            first, self.state = admit_row(
                *args, jnp.asarray(padded), jnp.asarray(P, jnp.int32), self._split(),
                jnp.asarray([t, k, p, mp], jnp.float32),
                jnp.asarray(row.eos_id, jnp.int32), **common,
            )
        self._activate(slot, row, int(first))

    def _start_prefill(self, slot: int, row: RowHandle):
        """Chunked-prefill admission: seed a private row cache (from a prefix hit
        when one matches) and queue the slot for incremental chunks."""
        row_cache = llama.init_kv_cache(self.config, 1, dtype=self.cache_dtype)
        start = 0
        hit = self._match_prefix(row.ids) if self.prefix_cap else None
        if hit is not None:
            tree, p0, _ = self.prefixes[hit]
            self.prefixes[hit][2] = self._lru = self._lru + 1
            row_cache = _seed_prefix(row_cache, tree)
            start = p0
            self.prefix_hits += 1
            self.prefix_tokens_reused += p0
        self.admitting[slot] = _Admitting(row, row_cache, start)

    def _advance_prefill(self, slot: int):
        """Run ONE prefill chunk for an admitting slot; on the last chunk, sample
        the first token, install the row cache into the slot lane, and go live."""
        st = self.admitting[slot]
        ids, C = st.row.ids, self.prefill_chunk
        start, end = st.next, min(st.next + self.prefill_chunk, len(ids))
        padded = np.full((1, C), self.pad_id, np.int32)
        padded[0, : end - start] = ids[start:end]
        st.cache, h_last = prefill_chunk(
            self.params, self.config, st.cache, jnp.asarray(padded),
            jnp.asarray(start, jnp.int32), jnp.asarray(end - start, jnp.int32),
            first=(start == 0),
        )
        self.prefill_dispatches += 1
        st.next = end
        if end == len(ids):
            t, k, p, mp = st.row.sampling
            first = sample_first(
                self.params, self.config, h_last, self._split(),
                jnp.asarray([t, k, p, mp], jnp.float32),
            )
            self.state = install_row(
                self.state, jnp.asarray(slot, jnp.int32), st.cache, first,
                jnp.asarray(len(ids), jnp.int32), jnp.asarray(st.row.eos_id, jnp.int32),
            )
            del self.admitting[slot]
            self._activate(slot, st.row, int(first))

    def _budget_cap(self, row: RowHandle) -> int:
        """Decode budget capped by cache capacity (prefill took P slots, the first
        token sits at P — the chunk scan writes from P+1 on). Subclasses tighten."""
        return min(row.max_tokens, self.config.max_seq_len - len(row.ids))

    def _activate(self, slot: int, row: RowHandle, first: int):
        """Common go-live bookkeeping once a row's cache lane and first token exist."""
        self.rows[slot] = row
        t, k, p, mp = row.sampling
        self.temp[slot], self.topk[slot] = t, k
        self.topp[slot], self.minp[slot] = p, mp
        self.eos[slot] = row.eos_id
        self.budget[slot] = self._budget_cap(row)
        self.emitted_seen[slot] = 1
        self.admissions += 1
        row.tokens.append(first)
        self._deliver(row, [first])
        if self.prefix_cap:
            self._harvest_prefix(slot, row.ids)
        if row.tokens[-1] == row.eos_id or len(row.tokens) >= self.budget[slot]:
            # the lane freezes on its own within a step (eos set done at admit;
            # budget trips via emitted >= budget) — free the slot immediately
            self._finish(slot)

    @staticmethod
    def _deliver(row: RowHandle, new: list[int]):
        if row.stream_q is not None and new:
            row.stream_q.put(list(new))

    def _finish(self, slot: int):
        row = self.rows[slot]
        self.rows[slot] = None
        self.eos[slot] = -1
        if row is not None:
            if row.stream_q is not None:
                row.stream_q.put(None)
            row.event.set()

    def _dispatch_chunk(self):
        """One decode dispatch over every slot. → (tokens [N, W], emitted [N],
        done [N]) as DEVICE arrays (async — the caller syncs them one chunk later;
        see _run's pipelining). Subclasses substitute their own chunk program
        (speculative rounds) while keeping the scheduler loop's token-delivery
        contract: each row's new tokens are the [:emitted_delta] prefix of its
        tokens row."""
        keys = jax.random.split(self._split(), self.chunk_size)
        toks, self.state = decode_rows(
            self.params, self.config, self.state, keys,
            jnp.asarray(self.temp), jnp.asarray(self.topk),
            jnp.asarray(self.topp), jnp.asarray(self.minp),
            jnp.asarray(self.eos), jnp.asarray(self.budget),
            pad_id=self.pad_id,
        )
        self.dispatches += 1
        # emitted/done are leaves of the DONATED state: the next dispatch deletes
        # their buffers while this chunk is still awaiting collection — hand the
        # collector its own (async, device-side) copies
        return toks, self.state[4].copy(), self.state[3].copy()

    def _collect(self, chunk):
        """Sync one dispatched chunk's results and deliver them. ``chunk`` carries a
        snapshot of the row list AT DISPATCH TIME: a slot whose occupant changed since
        (finished last collect, new row admitted — its lane was dead during this
        chunk) is skipped, otherwise the dead lane's stale ``emitted`` would be read
        against the new row's counter."""
        toks_d, emitted_d, done_d, snap = chunk
        toks, emitted, done = np.asarray(toks_d), np.asarray(emitted_d), np.asarray(done_d)
        for slot, row in enumerate(snap):
            if row is None or row is not self.rows[slot]:
                continue
            # freeze is monotone: this chunk's valid tokens are a prefix
            n_new = int(emitted[slot] - self.emitted_seen[slot])
            self.emitted_seen[slot] = emitted[slot]
            new = [int(t) for t in toks[slot, :n_new]]
            row.tokens.extend(new)
            self._deliver(row, new)
            if done[slot]:
                self._finish(slot)

    def _run(self):
        # One chunk stays IN FLIGHT: chunk N is dispatched before chunk N-1's results
        # are synced, so the device computes while the host walks tokens. Without this
        # every chunk boundary idles the chip for a full device->host round-trip
        # (~30 ms through the tunnel) — measured 0.75x vs serialized at 1B geometry,
        # where the chunk's compute is too small to amortize the sync. The price is
        # one chunk of lag on slot reuse and token delivery.
        inflight = None  # (toks, emitted, done device arrays, rows snapshot)
        try:
            while True:
                with self.cond:
                    while (not self._stop and not self.queue and not self.admitting
                           and all(r is None for r in self.rows) and inflight is None):
                        self.cond.wait()
                    if self._stop:
                        break
                    pending = self.queue
                    self.queue = []
                # admit into free slots; overflow returns to the queue. The free-slot
                # view lags one chunk: slots freed by the in-flight chunk are reused
                # on the next iteration.
                for slot in range(self.n_slots):
                    if pending and self.rows[slot] is None and slot not in self.admitting:
                        if self.prefill_chunk:
                            self._start_prefill(slot, pending.pop(0))
                        else:
                            self._admit(slot, pending.pop(0))
                if pending:
                    with self.cond:
                        self.queue = pending + self.queue
                # one prefill chunk per admitting slot per iteration: co-tenants get
                # a decode chunk between every pair of prefill chunks
                for slot in list(self.admitting):
                    self._advance_prefill(slot)

                nxt = None
                if any(r is not None for r in self.rows):
                    nxt = (*self._dispatch_chunk(), list(self.rows))
                if inflight is not None:
                    self._collect(inflight)
                inflight = nxt
            if inflight is not None:  # stop requested: flush the in-flight chunk
                self._collect(inflight)
        except Exception as e:  # worker must never die silently
            with self.cond:
                self.dead = e
                broken = ([r for r in self.rows if r is not None]
                          + [st.row for st in self.admitting.values()] + self.queue)
                self.rows = [None] * self.n_slots
                self.admitting = {}
                self.queue = []
            for row in broken:
                row.error = e
                if row.stream_q is not None:
                    row.stream_q.put(None)
                row.event.set()
