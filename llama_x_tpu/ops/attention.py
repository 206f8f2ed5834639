"""Attention mask metadata + XLA reference attention.

The reference dispatches between three attention paths (modelling/llama.py:129-137):
FlexAttention with a document block-mask, SDPA with an explicit mask (decode), and SDPA
``is_causal`` (plain training). Here one interface subsumes all of them: ``MaskInfo``
carries *static-shape* mask metadata — per-token segment ids (document masking, cf.
train_metamathqa.py:67-68), per-row bidirectional-prefix lengths (prefix-LM over audio
tokens, the README's stated plan), and decode position bounds — and every attention
implementation (this XLA reference and the Pallas flash kernel in
``ops/flash_attention.py``) consumes the same metadata.

GQA is handled by reshaping query heads into ``[n_kv, group]`` blocks and broadcasting
K/V, never by materializing repeated K/V (the reference repeat_interleaves,
modelling/llama.py:130-131 — wasteful on TPU HBM).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MaskInfo(NamedTuple):
    """Static-shape attention mask metadata.

    causal:       apply q_pos >= kv_pos.
    segment_ids:  [B, S] int32 document ids; attention only within equal ids. Id 0 marks
                  padding by convention of the packed data pipeline; pad tokens still
                  attend to themselves (their loss is masked by label -100 anyway).
    prefix_len:   [B] int32; positions < prefix_len form a bidirectional prefix *within
                  segment 0 semantics* — q and kv both inside the prefix always attend
                  (prefix-LM over early-fusion modality tokens).
    q_positions / kv_positions: absolute positions of the q block and kv block; required
                  when q is a decode slice over a full-length KV cache. When None, both
                  default to arange over the respective sequence axes.
    kv_len:       [B] int32 number of valid kv entries (decode: mask out unwritten cache).
    """

    causal: bool = True
    segment_ids: jnp.ndarray | None = None
    kv_segment_ids: jnp.ndarray | None = None
    prefix_len: jnp.ndarray | None = None
    q_positions: jnp.ndarray | None = None
    kv_positions: jnp.ndarray | None = None
    kv_len: jnp.ndarray | None = None


def make_attention_mask(mask_info: MaskInfo, q_len: int, kv_len: int, batch: int) -> jnp.ndarray | None:
    """Materialize a [B, 1, q_len, kv_len] boolean mask from MaskInfo (True = attend).

    Used by the XLA reference path and by tests as the oracle for the Pallas kernel.
    Returns None when the mask is all-True (no masking at all).
    """
    mi = mask_info
    q_pos = mi.q_positions if mi.q_positions is not None else jnp.arange(q_len, dtype=jnp.int32)
    kv_pos = mi.kv_positions if mi.kv_positions is not None else jnp.arange(kv_len, dtype=jnp.int32)
    q_pos = jnp.broadcast_to(q_pos, (batch, q_len)) if q_pos.ndim == 1 else q_pos
    kv_pos = jnp.broadcast_to(kv_pos, (batch, kv_len)) if kv_pos.ndim == 1 else kv_pos

    mask = None

    def _and(a, b):
        return b if a is None else a & b

    if mi.causal:
        mask = _and(mask, q_pos[:, :, None] >= kv_pos[:, None, :])

    if mi.segment_ids is not None:
        kv_seg = mi.kv_segment_ids if mi.kv_segment_ids is not None else mi.segment_ids
        same_seg = mi.segment_ids[:, :, None] == kv_seg[:, None, :]
        mask = same_seg if mask is None else (mask & same_seg)

    if mi.prefix_len is not None:
        # bidirectional inside the prefix: q and kv both < prefix_len always attend
        in_prefix = (q_pos < mi.prefix_len[:, None])[:, :, None] & (kv_pos < mi.prefix_len[:, None])[:, None, :]
        mask = in_prefix if mask is None else (mask | in_prefix)

    if mi.kv_len is not None:
        valid = kv_pos < mi.kv_len[:, None]
        mask = _and(mask, valid[:, None, :])

    return None if mask is None else mask[:, None, :, :]


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_info: MaskInfo | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """XLA reference GQA attention.

    q: [B, Sq, Hq, D]; k, v: [B, Skv, Hkv, D] with Hq % Hkv == 0.
    Softmax in fp32 (matches SDPA numerics closely enough for bf16 training), output in
    q.dtype. Optional attention-probability dropout with inverted scaling (≡ the
    reference's training-only SDPA dropout, modelling/llama.py:136). This is the
    fallback/oracle path; the Pallas flash kernel is the fast path.
    """
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    group = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D**0.5)

    qf = q.reshape(B, Sq, Hkv, group, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # [B, Hkv, group, Sq, Skv]
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale

    if mask_info is not None:
        mask = make_attention_mask(mask_info, Sq, Skv, B)
        if mask is not None:
            logits = jnp.where(mask[:, :, None, :, :], logits, jnp.finfo(jnp.float32).min)

    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)
