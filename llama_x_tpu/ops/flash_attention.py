"""Pallas TPU flash attention with static mask metadata (causal / document / prefix-LM).

TPU-native replacement for the reference's FlexAttention + SDPA paths
(modelling/llama.py:129-137): ONE kernel whose ``MaskInfo`` metadata subsumes causal
training, packed-document segment masking (train_metamathqa.py:67-68) and prefix-LM
bidirectional-prefix masking (the README's stated plan). GQA is expressed by head-group
indexing in the BlockSpecs (kv block index = q_head // group), never by repeating K/V
(the reference repeat_interleaves, modelling/llama.py:130-131).

Design (standard TPU flash attention, tuned for the MXU):
- forward: grid (B, Hq, nq, nk), kv innermost ("arbitrary"); online softmax with fp32
  m/l/acc scratch in VMEM; QK^T and PV ride the MXU with fp32 accumulation; causal (and
  prefix-aware) whole-block skip guards the compute of blocks above the diagonal.
- backward: custom_vjp storing (q, k, v, lse); delta = rowsum(dO*O) in XLA; ONE fused
  kernel (grid over kv blocks, scanning q) producing dk, dv, and per-kv-block dq
  partials — a separate dq kernel would recompute the s/p/dp matmuls a second time
  (~35% of fwd+bwd, measured). dq partials reduce over the kv-block axis in XLA; dk/dv
  are produced per *query* head [B, Hq, Skv, D] in fp32 and the GQA group sum happens
  in XLA (cheap, fuses into the cast).
- row vectors (lse, delta) and segment ids are carried with a trailing singleton dim
  ([B, H, S, 1] / [B, S, 1] / [B, 1, S]) so every block shape satisfies the Mosaic
  (sublane % 8, lane % 128 | == array-dim) constraint.
- masked logits use -1e30 (not -inf) so fully-masked rows stay finite; such rows do not
  occur on the training paths (causal self-attention always attends to self; pad tokens
  share segment id 0 with each other).

Fallback: any shape/metadata the kernel doesn't cover (decode slices with q_positions,
non-128-multiple sequence lengths, head_dim not multiple of 64, non-TPU backend) routes
to the fused XLA reference in ops/attention.py — same math, same MaskInfo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention

_NEG_INF = -1e30
_LANES = 128

# test hook: run kernels in the Pallas interpreter (CPU) instead of requiring a TPU
INTERPRET = False


def _struct(shape, dtype, like):
    """ShapeDtypeStruct carrying the caller's varying-manual-axes set — required when
    the kernel runs inside shard_map (ring attention), harmless outside."""
    try:
        vma = jax.typeof(like).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _build_mask(q_start, kv_start, bq, bk, *, causal, qseg, kseg, prefix):
    """MaskInfo semantics as a [bq, bk] bool tile (must mirror
    ops/attention.py:make_attention_mask exactly: (causal & same_seg) | in_prefix).
    Returns None when nothing is masked. Built ONCE per grid cell and shared by every
    query head of the GQA group (the VPU iota/compare chain is a real cost next to the
    per-block matmuls).

    qseg: [bq, 1] int32 | None;  kseg: [1, bk] int32 | None;  prefix: scalar | None.
    """
    q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kv_pos = kv_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = None
    if causal:
        mask = q_pos >= kv_pos
    if qseg is not None:
        same = qseg == kseg
        mask = same if mask is None else (mask & same)
    if prefix is not None:
        in_prefix = (q_pos < prefix) & (kv_pos < prefix)
        mask = in_prefix if mask is None else (mask | in_prefix)
    return mask


def _apply_mask(s, mask, group, bq, bk):
    """s: [group*bq, bk] logits; mask: [bq, bk] bool | None (same for every group head)."""
    if mask is None:
        return s
    if group == 1:
        return jnp.where(mask, s, _NEG_INF)
    s3 = s.reshape(group, bq, bk)
    return jnp.where(mask[None], s3, _NEG_INF).reshape(group * bq, bk)


def _needed(q_start, kv_start, bq, bk, *, causal, prefix):
    """Whole-block compute guard: False only when every element is provably masked."""
    if not causal:
        return None
    cond = q_start + bq - 1 >= kv_start
    if prefix is not None:
        cond = cond | ((q_start < prefix) & (kv_start < prefix))
    return cond




# ---------------------------------------------------------------------------
# whole-block mask skip + base-2 softmax helpers
# ---------------------------------------------------------------------------
#
# On the 8B bench shape (S=4096, bq=256, bk=1024, causal + ~2000-token
# bidirectional audio prefix) ~64% of COMPUTED blocks are provably all-unmasked
# (strictly below the causal diagonal, or fully inside the prefix): building and
# applying the iota/compare mask chain there is pure VPU waste next to the two
# MXU matmuls. _all_true is the traced predicate that picks the unmasked kernel
# body. The base-2 constants serve the exp2/log2 online softmax (exp(x) lowers
# to exp2(x*log2e) plus a multiply on every [rows, bk] tile; folding log2e into
# the logit scale deletes that multiply).

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _seg_all_same(qseg, kseg):
    """True iff every q row and kv col in the tile shares one segment id."""
    qmin, qmax = jnp.min(qseg), jnp.max(qseg)
    kmin, kmax = jnp.min(kseg), jnp.max(kseg)
    return (qmin == qmax) & (kmin == kmax) & (qmin == kmin)


def _all_true(q_start, kv_start, bq, bk, *, causal, qseg, kseg, prefix):
    """Traced predicate: the [bq, bk] mask tile is provably all-True (so the
    masked-logits path can be skipped entirely). Mirrors _build_mask:
    (causal & same_seg) | in_prefix."""
    base = None
    if causal:
        base = q_start >= kv_start + bk - 1
    if qseg is not None:
        same = _seg_all_same(qseg, kseg)
        base = same if base is None else (base & same)
    out = base
    if prefix is not None:
        pfull = (q_start + bq - 1 < prefix) & (kv_start + bk - 1 < prefix)
        out = pfull if out is None else (out | pfull)
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fmix32(x):
    """murmur3 finalizer: full-avalanche 32-bit mix (plain VPU int ops — works
    identically on TPU hardware and in the CPU interpreter, unlike pltpu.prng_*)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _keep_for(seed, rate, rows, bk, b, h, i, j):
    """Deterministic per-block keep-mask, scaled by 1/(1-rate) (inverted dropout).

    Counter-based: bits = fmix32(fmix32(block_key) + element_index), where block_key
    folds (seed, b, h, i_qblock, j_kvblock). The backward kernel — whose grid visits
    (j, i) — recomputes the IDENTICAL mask for each (i, j) pair from the same seed;
    nothing is stored. Pure jnp, so tests can rebuild the exact mask outside the
    kernel as an oracle."""
    key = (
        jnp.uint32(seed)
        + jnp.uint32(b) * jnp.uint32(0x9E3779B9)
        + jnp.uint32(h) * jnp.uint32(0x85EBCA6B)
        + jnp.uint32(i) * jnp.uint32(0xC2B2AE35)
        + jnp.uint32(j) * jnp.uint32(0x27D4EB2F)
    )
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0).astype(jnp.uint32)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1).astype(jnp.uint32)
    bits = _fmix32(_fmix32(key) + r * jnp.uint32(bk) + c)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return jnp.where(bits >= threshold, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)




def _fwd_kernel(*refs, causal, has_seg, has_prefix, has_offsets, dropout_rate, bq, bk, group):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    qseg_ref = next(it) if has_seg else None
    kseg_ref = next(it) if has_seg else None
    prefix_ref = next(it) if has_prefix else None
    offs_ref = next(it) if has_offsets else None
    seed_ref = next(it) if dropout_rate > 0.0 else None
    out_ref, lse_ref = next(it), next(it)
    acc_ref, m_ref, l_ref = next(it), next(it), next(it)

    j = pl.program_id(3)
    nk = pl.num_programs(3)
    rows = group * bq  # the whole GQA group of query heads rides one grid cell

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    i = pl.program_id(2)
    # dynamic global-position offsets (ring attention: q lives at shard_start, the kv
    # block at the rotating source shard's start) — SMEM scalars, so the causal
    # whole-block skip stays a cheap traced predicate
    q_start = i * bq + (offs_ref[0, 0] if has_offsets else 0)
    kv_start = j * bk + (offs_ref[0, 1] if has_offsets else 0)
    prefix = prefix_ref[pl.program_id(0), 0] if has_prefix else None
    qseg = qseg_ref[0] if has_seg else None  # [bq, 1]
    kseg = kseg_ref[0] if has_seg else None  # [1, bk]
    # program ids read at kernel top level (the interpreter does not substitute them
    # inside pl.when bodies); the keep mask is seeded on the (i, j) block pair
    keep = (
        _keep_for(seed_ref[0, 0], dropout_rate, rows, bk, pl.program_id(0), pl.program_id(1), i, j)
        if dropout_rate > 0.0 else None
    )

    def compute(masked):
        q = q_ref[0, 0].reshape(rows, -1)  # [group*bq, D]
        k = k_ref[0, 0]  # [bk, D]
        # q arrives PRE-SCALED by scale*log2e (folded in XLA where it fuses into the
        # layout transpose), so s lands directly in the base-2 online-softmax domain —
        # the former `s *= scale*log2e` was a full fp32 VPU pass over every computed
        # [rows, bk] tile. exp/log then run as the VPU-native exp2/log2.
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            mask = _build_mask(
                q_start, kv_start, bq, bk, causal=causal, qseg=qseg, kseg=kseg, prefix=prefix,
            )
            s = _apply_mask(s, mask, group, bq, bk)
        m_prev = m_ref[:, :1]  # [group*bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        # softmax denominator uses UNDROPPED p (dropout applies to normalized probs:
        # out = (dropout(P) @ V) with P = softmax(s), ≡ modelling/llama.py:136)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv_in = p if keep is None else p * keep
        pv = jax.lax.dot_general(
            pv_in.astype(v_ref.dtype),
            v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    guard = _needed(q_start, kv_start, bq, bk, causal=causal, prefix=prefix)
    if not (causal or has_seg or has_prefix):
        compute(False)
    else:
        # whole-block mask skip: blocks provably all-True (below the causal diagonal /
        # fully inside the prefix / one uniform segment) never build or apply the
        # iota-compare mask chain — ~64% of computed blocks on the 8B prefix-LM shape
        allt = _all_true(q_start, kv_start, bq, bk, causal=causal, qseg=qseg,
                         kseg=kseg, prefix=prefix)
        need = jnp.bool_(True) if guard is None else guard
        pl.when(need & allt)(lambda: compute(False))
        pl.when(need & jnp.logical_not(allt))(lambda: compute(True))

    @pl.when(j == nk - 1)
    def _epilogue():
        l = l_ref[:, :1]
        out = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)
        out_ref[0, 0] = out.reshape(group, bq, -1)
        # m/l live in the base-2 domain; the stored lse is natural-log
        lse = (m_ref[:, :1] + jnp.log2(jnp.maximum(l, 1e-30))) * _LN2  # [group*bq, 1]
        lse_ref[0, 0] = lse.reshape(group, bq, 1)


def _fwd(q, k, v, qseg, kseg, prefix, *, scale, causal, bq, bk, offsets=None,
         dropout_rate=0.0, seed=None):
    """q [B,Hq,Sq,D]; k,v [B,Hkv,Skv,D]; qseg [B,Sq,1]; kseg [B,1,Skv]; prefix [B,1];
    offsets [1,2] int32 = (q_offset, kv_offset) global-position shifts (ring attention);
    seed [1,1] int32 enables in-kernel attention-probability dropout at dropout_rate.

    Returns out [B,Hq,Sq,D], lse [B,Hq,Sq,1] fp32 (normalized partial + logsumexp —
    mergeable across kv chunks in lse space).
    """
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    group = Hq // Hkv
    nq, nk = Sq // bq, Skv // bk
    has_seg, has_prefix = qseg is not None, prefix is not None
    has_offsets = offsets is not None
    if seed is None:
        dropout_rate = 0.0

    # fold scale*log2e into q HERE (f32 mul, one rounding to q.dtype — same error
    # class as the bf16 inputs themselves); the kernel's softmax then runs directly
    # in the base-2 domain with zero per-tile scaling passes. The backward performs
    # the IDENTICAL fold so its recomputed s matches the stored lse bit-for-bit.
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    # q is viewed [B, Hkv, group, Sq, D]: one grid cell processes a kv head's whole GQA
    # group — K/V stream once per group (not once per q head) and the mask tile is
    # built once and shared
    q5 = q.reshape(B, Hkv, group, Sq, D)
    in_specs = [
        pl.BlockSpec((1, 1, group, bq, D), lambda b, h, i, j: (b, h, 0, i, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0)),
    ]
    operands = [q5, k, v]
    if has_seg:
        in_specs += [
            pl.BlockSpec((1, bq, 1), lambda b, h, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, h, i, j: (b, 0, j)),
        ]
        operands += [qseg, kseg]
    if has_prefix:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # whole [B, 1] array
        operands.append(prefix)
    if has_offsets:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # [1, 2] (q_off, kv_off)
        operands.append(offsets)
    if dropout_rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # [1, 1] seed
        operands.append(seed)

    kernel = functools.partial(
        _fwd_kernel, causal=causal, has_seg=has_seg, has_prefix=has_prefix,
        has_offsets=has_offsets, dropout_rate=dropout_rate, bq=bq, bk=bk, group=group,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Hkv, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, group, bq, D), lambda b, h, i, j: (b, h, 0, i, 0)),
            pl.BlockSpec((1, 1, group, bq, 1), lambda b, h, i, j: (b, h, 0, i, 0)),
        ],
        out_shape=[
            _struct((B, Hkv, group, Sq, D), q.dtype, q),
            _struct((B, Hkv, group, Sq, 1), jnp.float32, q),
        ],
        scratch_shapes=[
            pltpu.VMEM((group * bq, D), jnp.float32),
            pltpu.VMEM((group * bq, _LANES), jnp.float32),
            pltpu.VMEM((group * bq, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * Hq * Sq * Skv * D * (0.5 if causal else 1.0)),
            bytes_accessed=2 * (B * Hq * Sq * D + 2 * B * Hkv * Skv * D),
            transcendentals=B * Hq * Sq * Skv,
        ),
        interpret=INTERPRET,
    )(*operands)
    return out.reshape(B, Hq, Sq, D), lse.reshape(B, Hq, Sq, 1)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(*refs, causal, has_seg, has_prefix, has_offsets, dropout_rate, bq, bk, group, fused_dq):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = (next(it) for _ in range(6))
    qseg_ref = next(it) if has_seg else None
    kseg_ref = next(it) if has_seg else None
    prefix_ref = next(it) if has_prefix else None
    offs_ref = next(it) if has_offsets else None
    seed_ref = next(it) if dropout_rate > 0.0 else None
    dk_ref, dv_ref = next(it), next(it)
    dqp_ref = next(it) if fused_dq else None
    dk_acc, dv_acc = next(it), next(it)

    i = pl.program_id(3)  # q block — innermost on this kernel
    nq = pl.num_programs(3)
    rows = group * bq

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    j = pl.program_id(2)
    q_start = i * bq + (offs_ref[0, 0] if has_offsets else 0)
    kv_start = j * bk + (offs_ref[0, 1] if has_offsets else 0)
    prefix = prefix_ref[pl.program_id(0), 0] if has_prefix else None
    qseg = qseg_ref[0] if has_seg else None
    kseg = kseg_ref[0] if has_seg else None
    # seeded (i=q block, j=kv block) exactly as the forward — same mask per pair
    keep = (
        _keep_for(seed_ref[0, 0], dropout_rate, rows, bk, pl.program_id(0), pl.program_id(1), i, j)
        if dropout_rate > 0.0 else None
    )

    def compute(masked):
        q = q_ref[0, 0].reshape(rows, -1)  # whole GQA group stacked [group*bq, D]
        k = k_ref[0, 0]
        # q is pre-scaled by scale*log2e (identically to the forward, see _bwd), so s
        # is already in the base-2 domain — no per-tile scaling pass
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if masked:
            mask = _build_mask(
                q_start, kv_start, bq, bk, causal=causal, qseg=qseg, kseg=kseg, prefix=prefix,
            )
            s = _apply_mask(s, mask, group, bq, bk)
        # lse is stored natural-log; exp2(s2 - lse*log2e) == exp(s - lse)
        p = jnp.exp2(s - lse_ref[0, 0].reshape(rows, 1) * _LOG2E)  # [group*bq, bk]
        do = do_ref[0, 0].reshape(rows, -1)  # [group*bq, D]
        # keep (hoisted to kernel top level) regenerates the EXACT forward mask for
        # this (i, j) block pair; with P_drop = P*keep:
        #   dV = P_dropᵀ dO,  ds = P∘(keep∘(dO Vᵀ) − delta)
        # (delta = rowsum(dO·out) already equals rowsum(P_drop∘dOVᵀ))
        p_v = p if keep is None else p * keep
        # contracting over the stacked group rows sums dk/dv over the group in-kernel
        dv_acc[:] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if keep is not None:
            dp = dp * keep
        # scale bookkeeping with the pre-scaled q (qs = q·scale·log2e):
        #   ds2 = ln2·p∘(dp − delta)   (same single fused mul the old `*scale` cost)
        #   dk  = ds2ᵀ·qs  ==  scale·(p∘(dp−delta))ᵀ·q          (ln2·log2e == 1)
        #   dq  = (ds2·k)·scale·log2e  — the last factor applied ONCE in XLA on the
        #         partials reduction, not per tile
        ds = p * (dp - delta_ref[0, 0].reshape(rows, 1)) * _LN2  # [group*bq, bk]
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if fused_dq:
            # dq contribution of THIS kv block; partials land in their own [j] slot and
            # are reduced in XLA — avoids running a whole second kernel that recomputes
            # s/p/dp just to accumulate dq over j
            dq_blk = jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dqp_ref[0, 0, 0] = dq_blk.reshape(group, bq, -1).astype(dqp_ref.dtype)

    guard = _needed(q_start, kv_start, bq, bk, causal=causal, prefix=prefix)
    if not (causal or has_seg or has_prefix):
        compute(False)
    else:
        # whole-block mask skip, as in the forward
        allt = _all_true(q_start, kv_start, bq, bk, causal=causal, qseg=qseg,
                         kseg=kseg, prefix=prefix)
        need = jnp.bool_(True) if guard is None else guard
        pl.when(need & allt)(lambda: compute(False))
        pl.when(need & jnp.logical_not(allt))(lambda: compute(True))
        if fused_dq:

            @pl.when(jnp.logical_not(need))
            def _zero_dq_partial():
                dqp_ref[0, 0, 0] = jnp.zeros_like(dqp_ref[0, 0, 0])

    @pl.when(i == nq - 1)
    def _write():
        dk_ref[0, 0] = dk_acc[:]
        dv_ref[0, 0] = dv_acc[:]


def _bwd(q, k, v, qseg, kseg, prefix, out, lse, do, *, scale, causal, bq, bk,
         offsets=None, delta=None, cast=True, dropout_rate=0.0, seed=None):
    """offsets/delta/cast: external-caller knobs for ring attention — position shifts,
    a precomputed delta (vs the FINAL merged out/lse), and fp32 outputs for cross-block
    accumulation."""
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    group = Hq // Hkv
    nq, nk = Sq // bq, Skv // bk
    has_seg, has_prefix = qseg is not None, prefix is not None
    has_offsets = offsets is not None
    if seed is None:
        dropout_rate = 0.0

    if delta is None:
        # delta = rowsum(dO * O), carried with trailing singleton: [B, Hq, Sq, 1]
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)

    # IDENTICAL scale*log2e fold as the forward (same f32 mul, same rounding), so the
    # kernel's recomputed s matches the stored lse exactly; see the ds2/dk/dq scale
    # bookkeeping in _bwd_dkv_kernel
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    # q-side arrays viewed [B, Hkv, group, ...] so one grid cell handles a kv head's
    # whole GQA group: K/V stream once per group, the mask tile is shared, and dk/dv
    # sum over the group INSIDE the kernel (outputs are per kv head directly)
    q5 = q.reshape(B, Hkv, group, Sq, D)
    do5 = do.reshape(B, Hkv, group, Sq, D)
    lse5 = lse.reshape(B, Hkv, group, Sq, 1)
    delta5 = delta.reshape(B, Hkv, group, Sq, 1)

    def qkv_specs():
        # grid (b, h, j, i): h over KV heads, kv-block parallel, q-block innermost
        qmap = lambda b, h, j, i: (b, h, 0, i, 0)
        kmap = lambda b, h, j, i: (b, h, j, 0)
        qsmap = lambda b, h, j, i: (b, i, 0)
        ksmap = lambda b, h, j, i: (b, 0, j)
        specs = [
            pl.BlockSpec((1, 1, group, bq, D), qmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, group, bq, D), qmap),  # do
            pl.BlockSpec((1, 1, group, bq, 1), qmap),  # lse
            pl.BlockSpec((1, 1, group, bq, 1), qmap),  # delta
        ]
        if has_seg:
            specs += [pl.BlockSpec((1, bq, 1), qsmap), pl.BlockSpec((1, 1, bk), ksmap)]
        if has_prefix:
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # whole [B, 1] array
        if has_offsets:
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # [1, 2]
        if dropout_rate > 0.0:
            specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # [1, 1] seed
        return specs

    operands = [q5, k, v, do5, lse5, delta5]
    if has_seg:
        operands += [qseg, kseg]
    if has_prefix:
        operands.append(prefix)
    if has_offsets:
        operands.append(offsets)
    if dropout_rate > 0.0:
        operands.append(seed)

    # One fused kernel computes dk, dv AND per-kv-block dq partials — running a separate
    # dq kernel would recompute the s/p/dp matmuls a second time (measured ~35% of the
    # whole fwd+bwd). The dq partials cost nk x extra HBM transiently and one XLA
    # reduction, which is far cheaper than the recompute.
    static = dict(
        causal=causal, has_seg=has_seg, has_prefix=has_prefix,
        has_offsets=has_offsets, dropout_rate=dropout_rate, bq=bq, bk=bk, group=group,
        fused_dq=True,
    )

    dk, dv, dq_partials = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **static),
        grid=(B, Hkv, nk, nq),
        in_specs=qkv_specs(),
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, 1, group, bq, D), lambda b, h, j, i: (b, h, j, 0, i, 0)),
        ],
        out_shape=[
            _struct((B, Hkv, Skv, D), jnp.float32, q),
            _struct((B, Hkv, Skv, D), jnp.float32, q),
            # dq partials in q.dtype when the caller casts anyway (training path):
            # the final dq is rounded to q.dtype regardless and nk <= 8, so per-
            # partial rounding is the same order as the final rounding — halves
            # 2*nk*Sq*Hq*D bytes of HBM partial traffic per layer. Ring attention
            # (cast=False) accumulates dq across kv shards and keeps fp32.
            _struct((B, Hkv, nk, group, Sq, D), jnp.float32 if not cast else q.dtype, q),
        ],
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32), pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(10 * B * Hq * Sq * Skv * D * (0.5 if causal else 1.0)),
            bytes_accessed=4 * B * Hq * Sq * D + 4 * B * Hkv * Skv * D + 4 * B * Hq * nk * Sq * D,
            transcendentals=B * Hq * Sq * Skv,
        ),
        interpret=INTERPRET,
    )(*operands)

    # the deferred dq scale (see kernel): one fused multiply on the partials reduction
    dq = jnp.sum(dq_partials, axis=2, dtype=jnp.float32).reshape(B, Hq, Sq, D) * (scale * _LOG2E)
    if not cast:
        return dq, dk, dv  # fp32 — ring attention accumulates across kv blocks
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# custom_vjp plumbing (one cached instance per static config)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_flash(scale: float, causal: bool, has_seg: bool, has_prefix: bool, bq: int, bk: int,
                dropout_rate: float = 0.0):
    def _norm(args):
        q, k, v, qseg, kseg, prefix = args
        return (q, k, v, qseg if has_seg else None, kseg if has_seg else None, prefix if has_prefix else None)

    dr = dict(dropout_rate=dropout_rate)

    @jax.custom_vjp
    def f(q, k, v, qseg, kseg, prefix, seed):
        out, _ = _fwd(*_norm((q, k, v, qseg, kseg, prefix)), scale=scale, causal=causal,
                      bq=bq, bk=bk, seed=seed, **dr)
        return out

    def f_fwd(q, k, v, qseg, kseg, prefix, seed):
        out, lse = _fwd(*_norm((q, k, v, qseg, kseg, prefix)), scale=scale, causal=causal,
                        bq=bq, bk=bk, seed=seed, **dr)
        # named so a remat policy can SAVE the attention output+lse — without this the
        # backward re-runs the whole forward kernel under jax.checkpoint (see
        # LlamaConfig.remat_policy='dots_flash')
        from jax.ad_checkpoint import checkpoint_name

        out, lse = checkpoint_name((out, lse), "flash_residuals")
        return out, (q, k, v, qseg, kseg, prefix, seed, out, lse)

    def f_bwd(res, do):
        q, k, v, qseg, kseg, prefix, seed, out, lse = res
        dq, dk, dv = _bwd(
            *_norm((q, k, v, qseg, kseg, prefix)), out, lse, do, scale=scale, causal=causal,
            bq=bq, bk=bk, seed=seed, **dr,
        )
        return dq, dk, dv, None, None, None, None

    f.defvjp(f_fwd, f_bwd)
    return f


def flash_plan(q_shape, k_shape, mask_info, block_q: int = 512, block_kv: int = 1024):
    """Static plan (bq, bk) for the kernel on these shapes, or None when the kernel
    doesn't apply (non-TPU, explicit positions, unaligned shapes). Shared gate for the
    custom_vjp wrapper path and the residual-level API below."""
    mi = mask_info or MaskInfo(causal=False)
    B, Sq, Hq, D = q_shape
    _, Skv, Hkv, _ = k_shape
    bq = _pick_bq(Sq, block_q, Hq // max(Hkv, 1)) if Hkv and Hq % Hkv == 0 else None
    bk = _pick_block(Skv, block_kv)
    unsupported = (
        (jax.default_backend() != "tpu" and not INTERPRET)
        or mi.q_positions is not None
        or mi.kv_positions is not None
        or mi.kv_len is not None
        or bq is None
        or bk is None
        or D % 64 != 0
        or Hq % Hkv != 0
    )
    return None if unsupported else (bq, bk)


def _seg_operands(mi: MaskInfo, B: int, Sq: int, Skv: int):
    has_seg = mi.segment_ids is not None
    kv_seg = mi.kv_segment_ids if mi.kv_segment_ids is not None else mi.segment_ids
    has_prefix = mi.prefix_len is not None
    qseg = mi.segment_ids.astype(jnp.int32).reshape(B, Sq, 1) if has_seg else None
    kseg = kv_seg.astype(jnp.int32).reshape(B, 1, Skv) if has_seg else None
    prefix = mi.prefix_len.astype(jnp.int32).reshape(B, 1) if has_prefix else None
    return qseg, kseg, prefix


def flash_fwd_with_lse(q, k, v, mask_info, plan, scale: float | None = None):
    """Residual-level forward: model-layout [B, S, H, D] in/out, also returns the fp32
    lse [B, Hq, Sq, 1]. For callers that manage their own remat residuals (the int8
    attention custom_vjp in models/llama.py) — no inner custom_vjp, no checkpoint
    names; pair with flash_bwd_from_res. No dropout (callers fall back)."""
    mi = mask_info or MaskInfo(causal=False)
    B, Sq, Hq, D = q.shape
    _, Skv, _, _ = k.shape
    bq, bk = plan
    if scale is None:
        scale = 1.0 / (D**0.5)
    qseg, kseg, prefix = _seg_operands(mi, B, Sq, Skv)
    out, lse = _fwd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        qseg, kseg, prefix, scale=float(scale), causal=bool(mi.causal), bq=bq, bk=bk,
    )
    return out.transpose(0, 2, 1, 3), lse


def flash_bwd_from_res(q, k, v, out, lse, do, mask_info, plan, scale: float | None = None):
    """Backward from saved (out, lse) residuals: model-layout q/k/v/out/do in,
    model-layout (dq, dk, dv) out. The counterpart of flash_fwd_with_lse."""
    mi = mask_info or MaskInfo(causal=False)
    B, Sq, Hq, D = q.shape
    _, Skv, _, _ = k.shape
    bq, bk = plan
    if scale is None:
        scale = 1.0 / (D**0.5)
    qseg, kseg, prefix = _seg_operands(mi, B, Sq, Skv)
    dq, dk, dv = _bwd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        qseg, kseg, prefix, out.transpose(0, 2, 1, 3), lse, do.transpose(0, 2, 1, 3),
        scale=float(scale), causal=bool(mi.causal), bq=bq, bk=bk,
    )
    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3),
        dv.transpose(0, 2, 1, 3),
    )


def _pick_block(s: int, target: int, candidates: tuple = (512, 256, 128)) -> int | None:
    for b in (target, *candidates):
        if b <= s and s % b == 0:
            return b
    return None


def _pick_bq(sq: int, block_q: int, group: int) -> int | None:
    """Query block capped so group*bq <= 1024 rows per grid cell: the per-cell fp32
    [group*bq, bk] logit tiles blow the ~16 MB scoped-VMEM limit beyond that
    (observed at 8B: group=4, bq=512 -> 23.3 MB stack allocation). Holds for every
    group factor incl. MQA (group=32 -> bq=32). The 64/32 candidates exist ONLY for
    this row cap — kv/default block picking keeps the swept >=128 set so odd sequence
    lengths still take the XLA fallback rather than an unswept kernel config."""
    cap = max(32, 1024 // max(group, 1))
    return _pick_block(sq, min(block_q, cap), candidates=(512, 256, 128, 64, 32))


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_info: MaskInfo | None = None,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 1024,  # tuned on v5e (S=4096 GQA fwd+bwd sweep; ties jax's bundled kernel)
    dropout_rate: float = 0.0,
    dropout_rng: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flash attention over [B, S, H, D] layout (the model's layout).

    Falls back to the XLA reference path whenever the kernel's static assumptions don't
    hold (decode slices with explicit positions, unaligned shapes, non-TPU backend).
    Attention-probability dropout (≡ the reference's training-only SDPA dropout,
    modelling/llama.py:136) runs IN-KERNEL via the TPU PRNG: the keep-mask is
    regenerated in the backward from the same (seed, block) tuple — nothing stored.
    """
    mi = mask_info or MaskInfo(causal=False)
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    plan = flash_plan(q.shape, k.shape, mask_info, block_q, block_kv)
    if plan is None:
        return dot_product_attention(
            q, k, v, mask_info, scale, dropout_rate=dropout_rate, dropout_rng=dropout_rng
        )
    bq, bk = plan

    if scale is None:
        scale = 1.0 / (D**0.5)

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    seed = (
        jax.random.randint(dropout_rng, (1, 1), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        if use_dropout else jnp.zeros((1, 1), jnp.int32)
    )

    has_seg = mi.segment_ids is not None
    kv_seg = mi.kv_segment_ids if mi.kv_segment_ids is not None else mi.segment_ids
    has_prefix = mi.prefix_len is not None

    # dummies keep the custom_vjp arity fixed; ignored when the static flag is off
    qseg = mi.segment_ids.astype(jnp.int32).reshape(B, Sq, 1) if has_seg else jnp.zeros((B, 1, 1), jnp.int32)
    kseg = kv_seg.astype(jnp.int32).reshape(B, 1, Skv) if has_seg else jnp.zeros((B, 1, 1), jnp.int32)
    prefix = mi.prefix_len.astype(jnp.int32).reshape(B, 1) if has_prefix else jnp.zeros((B, 1), jnp.int32)

    # head-major [B, H, S, D] kernels behind model-layout transposes. A layout-
    # native variant (lane-sliced [bq, group*D] q blocks, no transposes) was built
    # and measured SLOWER on the 8B shape (fwd 0.85x, fwd+bwd 0.81x —
    # tools/bench_flash_native.py): the per-head [bq, D] matmuls fragment the MXU
    # vs the stacked [group*bq, D] ones, and the strided k/v lane-slice DMA
    # (256-byte chunks) costs more than the XLA transposes it removes.
    qt = q.transpose(0, 2, 1, 3)  # [B, Hq, Sq, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    f = _make_flash(
        float(scale), bool(mi.causal), has_seg, has_prefix, bq, bk,
        float(dropout_rate) if use_dropout else 0.0,
    )
    out = f(qt, kt, vt, qseg, kseg, prefix, seed)
    return out.transpose(0, 2, 1, 3)
