"""Pallas TPU flash attention with static mask metadata (causal / document / prefix-LM).

TPU-native replacement for the reference's FlexAttention + SDPA paths
(modelling/llama.py:129-137): one kernel whose ``MaskInfo`` metadata subsumes causal
training, packed-document masking (train_metamathqa.py:67-68) and prefix-LM
bidirectional-prefix masking (the README's plan). GQA is expressed by head grouping, not
repeat_interleave.

NOTE: placeholder dispatch for now — delegates to the fused XLA reference path while the
Pallas kernel lands later in this round. The call signature is final.
"""

from __future__ import annotations

import jax.numpy as jnp

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_info: MaskInfo | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    return dot_product_attention(q, k, v, mask_info, scale)
