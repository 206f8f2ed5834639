"""Ring attention: exact context parallelism over a mesh axis (ICI ring).

The reference has no distributed layer at all (SURVEY.md §2.3); its long-context story is
packing + FlexAttention block masks on one GPU. This is the TPU-native scale-out of the
same attention semantics: the sequence is sharded over a mesh axis ("cp"), K/V shards
rotate around the ring with ``lax.ppermute`` while every device's resident Q attends to
each passing block, and the per-block partial softmaxes are merged exactly in
log-sum-exp space — bit-equivalent (up to fp reassociation) to dense attention over the
full sequence, with O(S/cp) memory per device.

Design notes:
- per-block attention returns (out, lse) and the blocks merge as
      lse = logaddexp(lse_a, lse_b);  out = out_a·e^{lse_a−lse} + out_b·e^{lse_b−lse}
  which is associative — the ring is a ``lax.scan`` over cp steps (compute and the
  ppermute of the next KV block are issued together, so XLA overlaps transfer with
  compute along the ring).
- masking reuses ``MaskInfo`` semantics with *global* positions: q positions are offset
  by this device's shard start, kv positions by the current block's source shard. The
  whole thing is differentiable by construction (plain jnp + ppermute), so grads flow
  through the ring with no custom VJP.
- call it inside ``shard_map`` with the sequence axis sharded over ``axis_name``;
  ``llama_x_tpu.parallel.context_parallel_attention`` wires that up from the model.

This is the CP member of the attention family (same MaskInfo interface as
ops/attention.py and the Pallas kernel in ops/flash_attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama_x_tpu.ops.attention import MaskInfo, make_attention_mask

_NEG_INF = -1e30


def _block_attention(q, k, v, mask, scale):
    """Flash-style block attention returning (out fp32, lse fp32).

    q [B, Sq, Hq, D]; k, v [B, Skv, Hkv, D]; mask [B, 1, Sq, Skv] bool or None.
    GQA by head grouping. Stays in plain jnp so it is differentiable and XLA-fusible.
    """
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv

    qf = q.reshape(B, Sq, Hkv, group, D).astype(jnp.float32)
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, k.astype(jnp.float32)) * scale
    if mask is not None:
        s = jnp.where(mask[:, :, None, :, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p, v.astype(jnp.float32))
    # fully-masked rows: m = -1e30 so lse ~ -1e30 naturally — the merge weight
    # exp(lse - merged_lse) underflows to 0 and the (normalized-garbage) out is ignored
    lse = m[..., 0] + jnp.log(jnp.maximum(l, 1e-30))  # [B, Hkv, group, Sq]
    # normalize per-block so the merge is a convex combination
    out = out / jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2)[..., None]  # [B,Sq,Hkv,g,D]
    out = out.reshape(B, Sq, Hq, D)
    lse = lse.transpose(0, 3, 1, 2).reshape(B, Sq, Hq)
    return out, lse


def _merge(out_a, lse_a, out_b, lse_b):
    """Log-sum-exp merge of two normalized partial attentions (associative)."""
    lse = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse)[..., None]
    wb = jnp.exp(lse_b - lse)[..., None]
    return out_a * wa + out_b * wb, lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_info: MaskInfo | None = None,
    scale: float | None = None,
    axis_name: str = "cp",
) -> jnp.ndarray:
    """Exact attention over a sequence sharded across ``axis_name``.

    Must run inside shard_map. q/k/v: the LOCAL shard [B, S_local, H, D] (same S_local
    on every device). mask_info.segment_ids, if given, is the local q shard's ids; kv
    segment ids ride the ring alongside K/V. Returns the local output shard.
    """
    mi = mask_info or MaskInfo(causal=False)
    B, S_local, Hq, D = q.shape
    if scale is None:
        scale = 1.0 / (D**0.5)

    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    q_pos = my_idx * S_local + jnp.arange(S_local, dtype=jnp.int32)
    q_pos = jnp.broadcast_to(q_pos[None, :], (B, S_local))

    local_seg = mi.segment_ids if mi.segment_ids is not None else jnp.zeros((B, S_local), jnp.int32)

    def block_mask_info(kv_idx, kv_seg):
        kv_pos = kv_idx * S_local + jnp.arange(S_local, dtype=jnp.int32)
        return MaskInfo(
            causal=mi.causal,
            segment_ids=local_seg if mi.segment_ids is not None else None,
            kv_segment_ids=kv_seg if mi.segment_ids is not None else None,
            prefix_len=mi.prefix_len,
            q_positions=q_pos,
            kv_positions=jnp.broadcast_to(kv_pos[None, :], (B, S_local)),
        )

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        out, lse, kv_k, kv_v, kv_seg, kv_idx = carry
        bmi = block_mask_info(kv_idx, kv_seg)
        mask = make_attention_mask(bmi, S_local, S_local, B)
        blk_out, blk_lse = _block_attention(q, kv_k, kv_v, mask, scale)
        out, lse = _merge(out, lse, blk_out, blk_lse)
        # rotate kv to the next device (send to right neighbor = receive the left
        # neighbor's shard → the block index we hold decreases by 1 mod n)
        kv_k = jax.lax.ppermute(kv_k, axis_name, perm)
        kv_v = jax.lax.ppermute(kv_v, axis_name, perm)
        kv_seg = jax.lax.ppermute(kv_seg, axis_name, perm)
        kv_idx = jax.lax.convert_element_type((kv_idx - 1) % n_dev, jnp.int32)
        return (out, lse, kv_k, kv_v, kv_seg, kv_idx), None

    out0 = jnp.zeros((B, S_local, Hq, D), jnp.float32)
    lse0 = jnp.full((B, S_local, Hq), _NEG_INF, jnp.float32)
    # freshly-created carries are "unvarying" under shard_map's manual-axes tracking,
    # but the scan body makes them vary over the ring axis AND any other manual axes
    # the inputs carry (e.g. a dp-sharded batch) — mark them up front
    try:
        in_axes = set(jax.typeof(q).vma)
    except Exception:
        in_axes = set()
    in_axes.add(axis_name)

    def vary(x):
        for ax in in_axes:
            try:
                x = jax.lax.pcast(x, (ax,), to="varying")
            except ValueError:  # already varying over ax
                pass
        return x
    carry = (
        vary(out0),
        vary(lse0),
        k,
        v,
        vary(local_seg),
        jax.lax.convert_element_type(my_idx, jnp.int32),
    )
    (out, lse, *_), _ = jax.lax.scan(step, carry, None, length=n_dev)
    return out.astype(q.dtype)
