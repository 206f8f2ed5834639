"""int8 rowwise weight quantization + quantized matmul with the reference's exact autograd.

Behavior spec (subclasses/int8.py):
- rowwise symmetric quant over the *output-feature* axis: scale = absmax(row)/127,
  clipped at 1e-12, values rounded to int8 (int8.py:10-16).
- forward, dynamic activation quant ON: rowwise-quantize the activations too and run an
  int8 x int8 GEMM with a fused (row_scale x col_scale) dequant epilogue (int8.py:111-114,
  the Triton kernel int8_mm.py) — on TPU this is the Pallas MXU kernel in
  ``ops/int8_mm.py``; an XLA fallback composes the same math.
- forward, OFF: weight-only mixed mm ``(x @ W_i8.T.astype(dtype)) * scale`` (int8.py:118).
- backward: grad_input = (g * w_scale) @ W_i8, NO weight gradient ever — the int8 base is
  frozen by construction (int8.py:123-130).

In JAX the "tensor subclass" becomes an explicit param subtree
``{"int_data": int8[out,in], "scale": dtype[out]}`` and a custom_vjp matmul. int leaves
are non-differentiable, so freezing falls out of the dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quantize_int8_rowwise(x: jnp.ndarray):
    """Symmetric rowwise int8 quant. x: [R, C] float -> (int8 [R, C], scale [R] x.dtype).

    Matches subclasses/int8.py:10-16: fp32 math, scale = absmax/127 clipped at 1e-12,
    round-half-to-even (torch.round and jnp.rint both round half to even).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=1) / 127.0
    q = xf / jnp.clip(scale, 1e-12, None)[:, None]
    q = jnp.rint(q).astype(jnp.int8)
    return q, scale.astype(dtype)


def quantize_int8_colwise(x: jnp.ndarray):
    """Symmetric colwise int8 quant. x: [R, C] float -> (int8 [R, C], scale [C] x.dtype).

    Per-COLUMN scales (absmax over axis 0) — the orientation needed when the quantized
    matrix is the RIGHT GEMM operand and the scale must factor over the output columns
    (e.g. the [D, V] LM head in the fused CE: scale per vocab entry). Same fp32 math /
    clipping / round-half-to-even as quantize_int8_rowwise."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=0) / 127.0
    q = xf / jnp.clip(scale, 1e-12, None)[None, :]
    q = jnp.rint(q).astype(jnp.int8)
    return q, scale.astype(dtype)


def _int8_mm_dequant_xla(a_i8, b_i8, row_scale, col_scale, out_dtype):
    """XLA fallback for the Pallas kernel: int8 x int8 -> int32, dequant epilogue.

    a_i8 [M, K], b_i8 [K, N], row_scale [M], col_scale [N] -> [M, N] out_dtype.
    """
    # accept [M]/[M,1] and [N]/[1,N] — a 2-D scale would otherwise silently broadcast
    # the output to [M, M, N]
    row_scale = row_scale.reshape(-1)
    col_scale = col_scale.reshape(-1)
    assert row_scale.shape == (a_i8.shape[0],) and col_scale.shape == (b_i8.shape[1],)
    acc = jax.lax.dot_general(
        a_i8,
        b_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * row_scale.astype(jnp.float32)[:, None] * col_scale.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)


def int8_mm_dequant(a_i8, b_i8, row_scale, col_scale, out_dtype=jnp.bfloat16,
                    block_m=None, block_n=None, block_k=None):
    """int8 GEMM with fused dequant. Dispatches to the Pallas MXU kernel on TPU,
    XLA fallback elsewhere. Equivalent of torch.ops.torchao.int8_mm_dequant
    (subclasses/int8_mm.py:121-149). block_* override the swept defaults (needed for
    shapes like the 128256 vocab where the defaults don't divide)."""
    from llama_x_tpu.ops import int8_mm as _pallas

    if _pallas.pallas_int8_available():
        return _pallas.int8_mm_dequant_pallas(
            a_i8, b_i8, row_scale, col_scale, out_dtype,
            block_m=block_m, block_n=block_n, block_k=block_k,
        )
    return _int8_mm_dequant_xla(a_i8, b_i8, row_scale, col_scale, out_dtype)


def _int8_mm_dequant_nt_xla(a_i8, b_nk_i8, row_scale, col_scale, out_dtype):
    """XLA fallback of the NT kernel: a [M, K] x b [N, K] (contraction on both dim-1s).
    Same integer math as _int8_mm_dequant_xla — dot_general handles the layout."""
    row_scale = row_scale.reshape(-1)
    col_scale = col_scale.reshape(-1)
    assert row_scale.shape == (a_i8.shape[0],) and col_scale.shape == (b_nk_i8.shape[0],)
    acc = jax.lax.dot_general(
        a_i8,
        b_nk_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * row_scale.astype(jnp.float32)[:, None] * col_scale.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)


def int8_mm_dequant_nt(a_i8, b_nk_i8, row_scale, col_scale, out_dtype=jnp.bfloat16,
                       block_m=None, block_n=None, block_k=None):
    """int8 GEMM with the weight in its NATIVE [out, in] layout (no transpose in the
    graph — see int8_mm.int8_mm_dequant_nt_pallas for why this is load-bearing at 8B)."""
    from llama_x_tpu.ops import int8_mm as _pallas

    if _pallas.pallas_int8_available():
        return _pallas.int8_mm_dequant_nt_pallas(
            a_i8, b_nk_i8, row_scale, col_scale, out_dtype,
            block_m=block_m, block_n=block_n, block_k=block_k,
        )
    return _int8_mm_dequant_nt_xla(a_i8, b_nk_i8, row_scale, col_scale, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def int8_linear(
    x: jnp.ndarray,
    int_data: jnp.ndarray,
    scale: jnp.ndarray,
    dynamic_int8_act: bool = False,
    dynamic_int8_bwd: bool = False,
):
    """x [..., in] @ dequant(W).T where W = {int_data [out, in], scale [out]}.

    custom_vjp reproduces _Int8Linear (subclasses/int8.py:106-130): no weight grad,
    grad_input = (g * scale) @ int_data.

    ``dynamic_int8_bwd`` additionally runs the dgrad on the int8 MXU path: the weight
    scale folds into g BEFORE rowwise quantization (it multiplies the contraction
    dim, so it cannot live in the epilogue), then (q(g*s) @ W_i8) * g_scale — same
    layout trick as the fwd (int_data consumed natively as the [K=out, N=in] operand,
    no transpose in the graph). int8 peak is ~2x bf16 on the MXU and dgrads through
    the frozen base are the single biggest slice of the 8B QLoRA step; the gradient
    rowwise-quant noise (~0.4%/row) is the trade — measured equivalent on the
    synthetic convergence artifacts before this became a supported config
    (runs/int8_bwd_quality).
    """
    return _int8_linear_fwd_impl(x, int_data, scale, dynamic_int8_act)


def _int8_linear_fwd_impl(x, int_data, scale, dynamic_int8_act):
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    # int_data is consumed in its native [out, in] layout on BOTH paths (dot_general
    # contracting dim 1, never `.T`): a transpose here gets hoisted out of the layer
    # scan by XLA into layout-converted copies of the whole frozen base (~4.8 GB at 8B)
    if dynamic_int8_act:
        x_i8, x_scale = quantize_int8_rowwise(x2)
        out = int8_mm_dequant_nt(x_i8, int_data, x_scale, scale, out_dtype=x.dtype)
    else:
        out = jax.lax.dot_general(
            x2, int_data.astype(x.dtype), (((1,), (1,)), ((), ()))
        ) * scale.astype(x.dtype)
    return out.reshape(*lead, int_data.shape[0])


def _int8_linear_fwd(x, int_data, scale, dynamic_int8_act, dynamic_int8_bwd):
    out = _int8_linear_fwd_impl(x, int_data, scale, dynamic_int8_act)
    # zero-size sentinel carries x.dtype through the residuals (dtypes aren't JAX types)
    return out, (int_data, scale, jnp.zeros((0,), x.dtype))


def _int8_linear_bwd(dynamic_int8_act, dynamic_int8_bwd, res, g):
    int_data, scale, x_proto = res
    if dynamic_int8_bwd:
        lead = g.shape[:-1]
        g2 = g.reshape(-1, g.shape[-1])
        # fold the weight scale into g, then rowwise-quantize: the scale multiplies
        # the contraction dim (out), so gx = q(g*s) @ W_i8 * g_scale is exact in the
        # scales and int8-rounded in g — the only lossy step
        g_i8, g_scale = quantize_int8_rowwise(g2 * scale.astype(g2.dtype))
        ones = jnp.ones((int_data.shape[1],), jnp.float32)
        gx = int8_mm_dequant(g_i8, int_data, g_scale, ones, out_dtype=x_proto.dtype)
        return gx.reshape(*lead, int_data.shape[1]), None, None
    # grad_input = (g * w_scale) @ W_i8   (subclasses/int8.py:127)
    gx = (g * scale.astype(g.dtype)) @ int_data.astype(g.dtype)
    return gx.astype(x_proto.dtype), None, None


int8_linear.defvjp(_int8_linear_fwd, _int8_linear_bwd)
