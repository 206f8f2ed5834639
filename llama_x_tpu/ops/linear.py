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


def _finish_linear(p: dict, out: jnp.ndarray, delta: jnp.ndarray | None) -> jnp.ndarray:
    """Post-base tail shared by the single and grouped paths: +LoRA delta, DoRA
    rescale, +bias (in that order — modelling/lora.py:40-62 semantics)."""
    if delta is not None:
        out = out + delta

    if "m" in p:
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


def apply_linear(
    x: jnp.ndarray, p: dict, *, dynamic_int8_act: bool = False, dynamic_int8_bwd: bool = False
) -> jnp.ndarray:
    out = _base_matmul(x, p, dynamic_int8_act, dynamic_int8_bwd)
    delta = None
    if "lora_a" in p:
        scale = p["lora_scale"].astype(x.dtype)
        delta = (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype) * scale
    return _finish_linear(p, out, delta)


def apply_linear_grouped(
    x: jnp.ndarray, ps, *, dynamic_int8_act: bool = False, dynamic_int8_bwd: bool = False
) -> tuple[jnp.ndarray, ...]:
    """Apply several linears to the SAME input, with their LoRA A-projections fused
    into ONE concatenated GEMM so x streams from HBM once instead of len(ps) times
    (XLA does not merge separate dots that share an operand).

    Exact: each output column of a matmul reads only its own weight column, so
    ``(x @ [A_q|A_k|A_v])[..., off:off+r] == x @ A_i`` in value and in gradient
    (dA_i is the matching slice of the concatenated cotangent). Motivation: the 8B
    qlora bench spends 40.7 ms/step in BW-bound LoRA-delta fusions re-reading the
    [B,S,D] activation per projection (linear.py:53 row of
    runs/profile_8b/top_ops.json); q/k/v and w1/w3 grouping removes ~3/7 of those
    reads in forward AND backward (d(xa) slices concatenate the same way)."""
    outs = [_base_matmul(x, p, dynamic_int8_act, dynamic_int8_bwd) for p in ps]
    lora_is = [i for i, p in enumerate(ps) if "lora_a" in p]
    deltas: dict[int, jnp.ndarray] = {}
    if len(lora_is) >= 2:
        xa = x @ jnp.concatenate([ps[i]["lora_a"].astype(x.dtype) for i in lora_is], axis=1)
        off = 0
        for i in lora_is:
            r = ps[i]["lora_a"].shape[1]
            deltas[i] = (xa[..., off:off + r] @ ps[i]["lora_b"].astype(x.dtype)) * ps[i][
                "lora_scale"
            ].astype(x.dtype)
            off += r
    elif lora_is:
        i = lora_is[0]
        deltas[i] = (x @ ps[i]["lora_a"].astype(x.dtype)) @ ps[i]["lora_b"].astype(x.dtype) * ps[
            i
        ]["lora_scale"].astype(x.dtype)
    return tuple(_finish_linear(p, out, deltas.get(i)) for i, (p, out) in enumerate(zip(ps, outs)))
