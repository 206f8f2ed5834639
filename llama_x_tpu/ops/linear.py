"""The single linear-application op every projection in the framework goes through.

The reference composes quantization and adapters by module surgery — tensor-subclass
interception of F.linear (subclasses/int8.py:59-67) plus in-place class swap to
LoRALinear/DoRALinear (modelling/lora.py:8-16). In JAX both become *data*: a linear's
param subtree may contain

  kernel    [in, out]              plain (bf16) base weight, or
  int_data  [out, in] int8         rowwise-quantized base  (+ scale [out])
  bias      [out]                  optional
  lora_a    [in, r], lora_b [r, out], lora_scale []        LoRA adapter
  m         [out]                                           DoRA magnitude

and ``apply_linear`` dispatches on which leaves are present. Composition order semantics
(quantize first, then adapt → int8 frozen base + bf16 trainable adapter, QLoRA-style,
cf. train_metamathqa.py:178-179) are preserved because the int8 base and the LoRA delta
are independent additive paths, exactly as in LoRALinear.forward (modelling/lora.py:40-44).

DoRA (modelling/lora.py:47-62): out = (base + x A B s) * (m / ||W + BAs||_col) with the
delta *detached* inside the norm (stop_gradient here, .detach() there), bias added after
the rescale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama_x_tpu.ops.int8 import int8_linear


def _base_matmul(x: jnp.ndarray, p: dict, dynamic_int8_act: bool, dynamic_int8_bwd: bool) -> jnp.ndarray:
    if "int_data" in p:
        return int8_linear(x, p["int_data"], p["scale"], dynamic_int8_act, dynamic_int8_bwd)
    return x @ p["kernel"].astype(x.dtype)


def _dequant_kernel(p: dict) -> jnp.ndarray:
    """Base weight as [in, out] float (for DoRA norm computation)."""
    if "int_data" in p:
        return (p["int_data"].astype(jnp.float32) * p["scale"].astype(jnp.float32)[:, None]).T
    return p["kernel"].astype(jnp.float32)


def apply_linear(
    x: jnp.ndarray, p: dict, *, dynamic_int8_act: bool = False, dynamic_int8_bwd: bool = False
) -> jnp.ndarray:
    out = _base_matmul(x, p, dynamic_int8_act, dynamic_int8_bwd)

    is_dora = "m" in p
    if "lora_a" in p:
        scale = p["lora_scale"].astype(x.dtype)
        delta = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype) * scale
        out = out + delta

    if is_dora:
        # column norm of (W + B A s) with the delta detached (modelling/lora.py:57-59);
        # the base weight is frozen in the reference, so stop its gradient too
        w = jax.lax.stop_gradient(_dequant_kernel(p))
        d_w = jax.lax.stop_gradient(
            p["lora_a"].astype(jnp.float32) @ p["lora_b"].astype(jnp.float32) * p["lora_scale"].astype(jnp.float32)
        )
        norm = jnp.linalg.norm(w + d_w, axis=0)  # [out]
        out = out * (p["m"].astype(jnp.float32) / norm).astype(out.dtype)

    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out
