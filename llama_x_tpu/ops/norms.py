"""RMSNorm. Reference uses nn.RMSNorm(embed_dim, eps=1e-5) (modelling/llama.py:158-160).

fp32 accumulation for the mean-square (standard practice and what torch does for
low-precision inputs), result cast back to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)
