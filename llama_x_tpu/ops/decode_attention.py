"""Pallas TPU decode attention: single-token queries over the static KV cache.

The reference's decode path is SDPA over the FULL static cache with a gathered bool
mask (modelling/llama.py:126-137, KVCache returns the whole [max_seq_len] cache) — at
position t it reads and masks max_seq_len - t dead keys. This kernel is the TPU-native
redesign: the grid walks kv-cache blocks and

- blocks past ``kv_len`` are never fetched: the BlockSpec index_map clamps their block
  index to the last valid block, and Mosaic's pipeline skips the DMA when consecutive
  grid steps map to the same block — HBM traffic is O(kv_len), not O(max_seq_len);
- the cache arrives in its storage layout [B, Hkv, S_max, D] (models/llama.py
  init_kv_cache), so every kv block is one CONTIGUOUS [bk, D] tile — strided per-head
  slices of a [B, S, Hkv, D] cache read 256-byte rows at 2 KB stride and waste most of
  the DMA bandwidth (measured slower than the XLA path before this layout);
- the whole GQA group of query heads rides one grid cell (rows = group), so the cache
  streams once per KV head (the reference repeat_interleaves K/V to n_heads);
- masking needs no materialized [B, H, 1, S] logits: the tail block masks
  ``kv_pos >= kv_len`` inline in the online softmax.

Decode attention at serving batch sizes is cache-bandwidth-bound (at B=16, S=4k the
cache is ~128 MB/layer vs 200 MB of weights), so cutting cache reads is the whole
game; the MXU matmuls here are tiny and irrelevant.

Forward-only by design: generation never differentiates. Training/prefill shapes go
through ops/flash_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANES = 128

# test hook (mirrors flash_attention.INTERPRET)
INTERPRET = False


def _kernel(lens_ref, *refs, scale, bk, group, sq, quantized):
    """Online-softmax decode body, shared by the bf16 and int8-cache paths and by
    every small query count (Sq = 1 plain decode, Sq = 2 the speculative draft's pair
    step, Sq = gamma+1 the target verify pass).

    The grid cell carries ``rows = sq * group`` query rows (all Sq positions x the
    whole GQA group) so the cache still streams exactly ONCE per KV head per token
    batch — the point of speculative decoding is amortizing that weight/cache read.
    Per-query causality is a ragged window: query i of row b sees kv_pos <
    lens_ref[b, i] (= min(kv_len, q_pos_i + 1), the ops/attention.py oracle's
    causal+kv_len conjunction), applied as a staircase select over the score rows.

    ``quantized``: K/V tiles arrive as int8 [bk, D] plus per-row f32 scales [bk, 1];
    dequant happens in VMEM (the HBM read is half the bf16 path's — the entire win).
    ``k_i8 * k_s`` is a sublane-aligned [bk, 1] broadcast along lanes, the layout
    Mosaic handles natively (folding the scale into the [rows, bk] score vector
    would need a sublane->lane relayout instead). Dequantized tiles are bf16, so
    scores carry exactly the bf16-cache path's rounding plus the int8 quantization
    error. ONE body for all (dtype, Sq) on purpose: the masking, the
    clamp-to-last-block DMA skip, and the l==0 epilogue guard must mirror the
    ops/attention.py oracle, and a second copy would be a drift surface."""
    if quantized:
        q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = refs
    else:
        q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref = refs
    b = pl.program_id(0)
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    rows = sq * group
    # unrolled max over the cell's Sq windows (SMEM scalar reads; sq is static <= 8):
    # blocks past every window are skipped, blocks inside any window run
    max_len = lens_ref[b, 0]
    for i in range(1, sq):
        max_len = jnp.maximum(max_len, lens_ref[b, i])

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j * bk < max_len)
    def _compute():
        q = q_ref[0, 0]  # [rows, D] — query-major: row r is query r//group, head r%group
        k = k_ref[0, 0]  # [bk, D]
        v = v_ref[0, 0]
        if quantized:
            k = k.astype(q.dtype) * ks_ref[0, 0].astype(q.dtype)
            v = v.astype(q.dtype) * vs_ref[0, 0].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s *= scale
        kv_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
        # staircase: row r's window is lens[b, r // group]
        limit = jnp.full((rows, bk), lens_ref[b, 0], jnp.int32)
        if sq > 1:
            row_q = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0) // group
            for i in range(1, sq):
                limit = jnp.where(row_q == i, lens_ref[b, i], limit)
        s = jnp.where(kv_pos < limit, s, _NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _epilogue():
        l = l_ref[:, :1]
        out_ref[0, 0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


def _decode_call(q, kv_args, kv_len, scale, block_kv, quantized):
    """Shared wrapper: grid/spec construction for both cache dtypes.
    kv_args: (k, v) bf16, or (k_i8, k_scale[..., 1], v_i8, v_scale[..., 1]) int8.
    kv_len: [B] (one window per row) or [B, Sq] (per-query windows)."""
    B, Sq, Hq, D = q.shape
    Hkv, S_max = kv_args[0].shape[1], kv_args[0].shape[2]
    assert 1 <= Sq <= MAX_SQ
    group = Hq // Hkv
    rows = Sq * group
    bk = _pick_bk(S_max, block_kv)
    nk = S_max // bk

    # query-major row packing per (b, kv-head): [B, Hkv, Sq*group, D]. For Sq == 1 the
    # transpose is a pure relabeling (no data movement).
    q4 = q.reshape(B, Sq, Hkv, group, D).transpose(0, 2, 1, 3, 4).reshape(B, Hkv, rows, D)
    lens = kv_len.astype(jnp.int32)
    lens = jnp.broadcast_to(lens.reshape(-1)[:, None] if lens.ndim <= 1 else lens, (B, Sq))

    def kv_map(b, h, j, lens_ref):
        # clamp dead blocks to the last valid one: consecutive identical block indices
        # skip the DMA, so blocks past every query's window are fetched zero times
        # (after the clamp target itself) — this is what makes decode O(kv_len) HBM
        # traffic. Uses the max over the cell's Sq windows.
        ml = lens_ref[b, 0]
        for i in range(1, Sq):
            ml = jnp.maximum(ml, lens_ref[b, i])
        last = jnp.maximum(pl.cdiv(ml, bk) - 1, 0)
        return (b, h, jnp.minimum(j, last), 0)

    data_spec = pl.BlockSpec((1, 1, bk, D), kv_map)
    # scales ride as [B, Hkv, S, 1] so the (bk, 1) tile satisfies the TPU block rule
    # (last dim == array dim) and broadcasts along lanes in-kernel
    scale_spec = pl.BlockSpec((1, 1, bk, 1), kv_map)
    kv_specs = [data_spec, scale_spec, data_spec, scale_spec] if quantized else [data_spec, data_spec]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nk),
        in_specs=[
            pl.BlockSpec((1, 1, rows, D), lambda b, h, j, lens_ref: (b, h, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, rows, D), lambda b, h, j, lens_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, D), jnp.float32),
            pltpu.VMEM((rows, _LANES), jnp.float32),
            pltpu.VMEM((rows, _LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, bk=bk, group=group, sq=Sq, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rows, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(lens, q4, *kv_args)
    return out.reshape(B, Hkv, Sq, group, D).transpose(0, 2, 1, 3, 4).reshape(B, Sq, Hq, D)


@functools.partial(jax.jit, static_argnames=("scale", "block_kv"))
def decode_attention_int8(
    q: jnp.ndarray,
    k_i8: jnp.ndarray,
    k_scale: jnp.ndarray,
    v_i8: jnp.ndarray,
    v_scale: jnp.ndarray,
    kv_len: jnp.ndarray,
    scale: float,
    block_kv: int = 1024,
) -> jnp.ndarray:
    """decode_attention over an int8-quantized cache (models/llama.py init_kv_cache
    with dtype=int8): k_i8/v_i8 [B, Hkv, S_max, D] int8, k_scale/v_scale
    [B, Hkv, S_max] f32 rowwise dequant scales. Same contract otherwise (incl. the
    small-Sq form with kv_len [B, Sq])."""
    kv_args = (
        k_i8, k_scale.astype(jnp.float32)[..., None],
        v_i8, v_scale.astype(jnp.float32)[..., None],
    )
    return _decode_call(q, kv_args, kv_len, scale, block_kv, quantized=True)


@functools.partial(jax.jit, static_argnames=("scale", "block_kv"))
def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    kv_len: jnp.ndarray,
    scale: float,
    block_kv: int = 1024,  # v5e sweep at S_max=16k: best full-length time, keeps the
    # partial-length win (smaller blocks pay per-cell overhead, larger ones waste
    # reads in the last partial block)
) -> jnp.ndarray:
    """q [B, Sq, Hq, D] (model layout, Sq <= MAX_SQ); k_cache/v_cache [B, Hkv, S_max, D]
    (cache storage layout — contiguous per-head blocks); kv_len int32 valid lengths:
    [B] (one window per row) or [B, Sq] (per-query windows — speculative verify's
    causal staircase, see effective_lens). Returns [B, Sq, Hq, D].

    Caller guarantees: S_max block-divisible, D % 128 == 0, Hq % Hkv == 0 (see
    decode_supported).
    """
    return _decode_call(q, (k_cache, v_cache), kv_len, scale, block_kv, quantized=False)


# largest query count the kernel packs into one grid cell (speculative verify uses
# Sq = gamma + 1; serving gammas are <= 7). Beyond this, fall back to XLA/flash.
MAX_SQ = 8


def _pick_bk(s: int, target: int) -> int | None:
    for b in (target, 1024, 512, 256, 128):
        if b <= s and s % b == 0:
            return b
    return None


# Measurement escape hatch (tools/bench_decode.py): bypass the measured-routing
# D % 128 gate below while keeping the hard capability constraint (D % 64). Lets the
# bench keep re-measuring the deliberately-unrouted hd=64 kernel on new hardware.
FORCE_KERNEL = False


def decode_supported(q_shape, kv_cache_shape, mi) -> bool:
    """True when the decode kernel covers this call (small-Sq causal decode over a
    [B, Hkv, S_max, D] cache with kv_len: Sq=1 plain decode, Sq=2 the speculative
    draft pair step, Sq=gamma+1 the verify pass). Everything else takes the XLA path."""
    B, Sq, Hq, D = q_shape
    _, Hkv, S_max, _ = kv_cache_shape
    return (
        (jax.default_backend() == "tpu" or INTERPRET)
        and 1 <= Sq <= MAX_SQ
        and mi.kv_len is not None
        and mi.causal
        # causal + no explicit position would mean "query at position 0" (the oracle's
        # iota semantics) — the kernel assumes the query is at kv_len-1 or q_positions
        and mi.q_positions is not None
        and mi.kv_positions is None
        and mi.segment_ids is None
        and mi.prefix_len is None
        # Routing is by MEASUREMENT (runs/bench_decode/decode.json, v5e): at D % 128
        # the kernel is parity at 4k caches and +11-12% at 16k, so it engages; at
        # D = 64 the kernel is CORRECT (decode_attention handles D % 64, tested) but
        # 0.5-0.8x XLA — the GQA group fills only `group` MXU rows per cell and the
        # half-width lanes waste the DMA, while XLA batches all heads into one GEMM.
        # TinyLlama-class models therefore stay on the XLA path on purpose.
        and (D % 128 == 0 or (FORCE_KERNEL and D % 64 == 0))
        and Hq % Hkv == 0
        and _pick_bk(S_max, 512) is not None
    )


def effective_lens(mi, B, Sq: int = 1) -> jnp.ndarray:
    """Oracle semantics: causal AND kv_pos < kv_len — with explicit query positions
    each query's effective window is min(kv_len, q_pos + 1). Returns [B, Sq] (the
    kernel's per-query staircase). Shared by the router and tests."""
    lens = jnp.broadcast_to(mi.kv_len.astype(jnp.int32).reshape(-1)[:, None], (B, Sq))
    if mi.q_positions is not None:
        qp = mi.q_positions.astype(jnp.int32)
        qp = jnp.broadcast_to(qp[None, -Sq:] if qp.ndim == 1 else qp[:, -Sq:], (B, Sq))
        lens = jnp.minimum(lens, qp + 1)
    return lens
