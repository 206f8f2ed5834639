"""Early-fusion core shared by every multimodal variant.

The reference implements exactly one fusion pattern (modelling/audio.py:38-77): modality
tokens are PREPENDED to the text embeddings, one rope spans the concatenated sequence,
and after the trunk the modality positions are sliced off so the loss covers text only.
Its README plans the same for images (README.md:12-16, "images planned"; BASELINE
configs 3 and 5). This module is that pattern as a single reusable function over an
arbitrary list of modality prefixes, with the optional prefix-LM attention mask
(bidirectional over ALL modality tokens, causal over text) the README describes.
"""

from __future__ import annotations

import jax.numpy as jnp

from llama_x_tpu.models import llama
from llama_x_tpu.ops.attention import MaskInfo


def fuse_forward(
    params: dict,
    config: llama.LlamaConfig,
    prefix_embeds: list[jnp.ndarray],
    tokens: jnp.ndarray,
    *,
    labels: jnp.ndarray | None = None,
    prefix_lm: bool = False,
    kv_cache=None,
    input_pos=None,
    kv_len=None,
    dropout_rng=None,
):
    """prefix_embeds: list of [B, T_i, D] modality token embeddings, prepended in order
    before the text tokens [B, S]. Returns loss/logits (+ new cache when one is given).
    """
    x = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)
    n_prefix = sum(int(p.shape[1]) for p in prefix_embeds)
    if prefix_embeds:
        x = jnp.concatenate([*[p.astype(x.dtype) for p in prefix_embeds], x], axis=1)

    if kv_cache is not None:
        q_pos = input_pos[None, :] if input_pos is not None else None
        # the bidirectional modality prefix must survive into cache prefill, or the
        # cached K/V mismatch prefix-LM training semantics
        pl = jnp.full((x.shape[0],), n_prefix, jnp.int32) if (prefix_lm and n_prefix > 0) else None
        mask_info = MaskInfo(causal=True, q_positions=q_pos, kv_len=kv_len, prefix_len=pl)
    elif prefix_lm and n_prefix > 0:
        mask_info = MaskInfo(causal=True, prefix_len=jnp.full((x.shape[0],), n_prefix, jnp.int32))
    else:
        mask_info = MaskInfo(causal=True)

    x, new_cache = llama.trunk(params, config, x, mask_info, kv_cache, input_pos, dropout_rng=dropout_rng)

    if n_prefix > 0:
        x = x[:, n_prefix:]  # strip modality positions before the head (audio.py:72-73)
    out = llama.head(params, config, x, labels)
    if kv_cache is not None:
        return out, new_cache
    return out
