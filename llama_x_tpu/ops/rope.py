"""Rotary position embeddings, including the Llama-3.1 long-context frequency rescale.

Behavior spec comes from the reference (modelling/llama.py:32-73): the rope table is
``[seq_len, head_dim//2, 2]`` holding ``(cos, sin)`` of ``pos * theta_j``; rotation pairs
*adjacent* feature dims ``(x[2j], x[2j+1])`` (gpt-fast convention, NOT HuggingFace's
half-split rotate_half), and the rotation is computed in float32 then cast back.

Llama-3.1 rescale (modelling/llama.py:32-51): frequencies whose wavelength exceeds
``old_context_len / low_freq_factor`` are divided by ``scale_factor``; wavelengths below
``old_context_len / high_freq_factor`` are kept; in between, linear interpolation in
"smoothness" space. Implemented vectorized (the reference loops in Python per frequency).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def default_rope_frequencies(head_dim: int, base: float = 50_000.0) -> np.ndarray:
    """theta_j = base^(-2j/head_dim), j in [0, head_dim/2)."""
    return 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))


def scale_llama3_1_rope(
    freqs: np.ndarray,
    scale_factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> np.ndarray:
    """Llama-3.1 frequency rescale, vectorized. Matches modelling/llama.py:32-51."""
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2.0 * np.pi / freqs

    smooth = (old_context_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
    interp = (1.0 - smooth) * freqs / scale_factor + smooth * freqs

    out = np.where(wavelen < high_freq_wavelen, freqs, np.where(wavelen > low_freq_wavelen, freqs / scale_factor, interp))
    return out.astype(freqs.dtype)


def build_rope(
    seq_len: int,
    head_dim: int,
    base: float = 50_000.0,
    is_llama3_1: bool = False,
    scale_factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> jnp.ndarray:
    """Precompute the rope table ``[seq_len, head_dim//2, 2]`` (cos, sin) in float32.

    Computed with numpy at trace time — the table is a compile-time constant folded into
    the jitted step, so there is no runtime cost.  Matches modelling/llama.py:54-60. The
    rescale parameters come from the checkpoint's rope_scaling (3.1: factor 8; 3.2: 32).
    """
    theta = default_rope_frequencies(head_dim, base)
    if is_llama3_1:
        theta = scale_llama3_1_rope(theta, scale_factor, low_freq_factor, high_freq_factor, old_context_len)
    pos = np.arange(seq_len, dtype=np.float32)
    angles = np.einsum("i,j->ij", pos, theta)
    table = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(table, dtype=jnp.float32)


def apply_rope(x: jnp.ndarray, rope: jnp.ndarray, positions: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rotate ``x`` of shape ``[B, S, H, head_dim]`` by the rope table.

    ``rope`` is ``[S, head_dim//2, 2]`` (already sliced / gathered to the right positions
    unless ``positions`` is given, in which case ``rope`` is the full table and we gather
    ``rope[positions]`` — used by the decode path, cf. modelling/llama.py:205).

    fp32 math, result cast back to ``x.dtype`` (modelling/llama.py:63-73). Adjacent-pair
    convention: pairs are ``(x[..., 2j], x[..., 2j+1])``.
    """
    if positions is not None:
        rope = rope[positions]  # [S, hd//2, 2], or [B, S, hd//2, 2] for per-row positions
    if rope.ndim == 4:
        # per-row positions (batched speculative decode: rows at different depths)
        cos = rope[..., 0][:, :, None, :]  # [B, S, 1, hd//2]
        sin = rope[..., 1][:, :, None, :]
    else:
        cos = rope[..., 0][None, :, None, :]  # [1, S, 1, hd//2]
        sin = rope[..., 1][None, :, None, :]
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    # re-interleave: stack last dim then flatten
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
