"""Pallas TPU int8 x int8 GEMM with fused rowwise/colwise dequant epilogue.

TPU-native counterpart of the reference's only hand-written kernel, the Triton
``_int8_mm_dequant_kernel`` (subclasses/int8_mm.py:52-118): int8 inputs, int32 MXU
accumulation, epilogue multiplies by row_scale[M] x col_scale[N] and casts to the output
dtype. The grouped-M swizzle / L2 tricks of the Triton kernel don't transfer — on TPU the
grid is pipelined through VMEM by the Mosaic compiler; we tile (M, N, K) with K innermost
and accumulate in an int32 VMEM scratch.

Two weight layouts share one implementation (``b_nk`` flag):
- KN: b [K, N], the plain-GEMM orientation.
- NK: b [N, K] — the quantized-linear layout (int_data is stored [out, in]). Consuming
  it untransposed (contraction on dim 1, native on the MXU) keeps ONE layout for every
  use of the frozen base; with a graph-level ``int_data.T`` XLA hoists the transpose out
  of the layer scan and materializes layout-converted copies of the whole stacked weight
  array — ~4.8 GB of HLO temps at 8B, the difference between fitting a 16 GB chip and OOM.

Tried and REJECTED (measured, don't retry): fusing the dynamic activation quantization
into this kernel (bf16 a in, rint(a/row_scale) per tile). It saves the separate XLA
quantize pass (~15 GB HBM/step at 8B) but the per-tile quantize re-runs for every
N-block that revisits the same a tile (N/bn = 28x on the MLP-up shape) and the f32
staging triples the a tile's VMEM — 8B step regressed 1109 -> 1238 ms (60.6 -> 54.3%
MFU). The two-step quantize-once path wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_int8_available() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(a_ref, b_ref, rs_ref, cs_ref, out_ref, acc_ref, *, b_nk=False):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # b_nk: b block is [bn, bk] (weight in its natural [N, K] layout) — contract over
    # its dim 1 on the MXU instead of materializing a transpose in the graph
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((1,), (1 if b_nk else 0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _epilogue():
        # rs_ref: [bm, 1], cs_ref: [1, bn]
        scaled = acc_ref[:].astype(jnp.float32) * rs_ref[:].astype(jnp.float32) * cs_ref[:].astype(jnp.float32)
        out_ref[:] = scaled.astype(out_ref.dtype)


def _default_blocks(M: int, N: int, K: int) -> tuple[int, int, int]:
    """Shape-keyed defaults from the v5e differential sweep on the 8B projections
    (tools/sweep_int8_blocks.py): for K <= 4096 a single K-step (bk = K) wins — the
    int32 accumulator is never revisited — 369 vs 289 TOPS on the MLP-up shape; for
    deep K (MLP-down, K=14336) large square blocks with bk=1024 win (339 TOPS)."""
    if K <= 4096:
        return 512, 512, K
    return 1024, 1024, 1024


def _int8_mm_call(a_i8, b_i8, row_scale, col_scale, out_dtype, block_m, block_n, block_k, b_nk):
    M, K = a_i8.shape
    N = b_i8.shape[0] if b_nk else b_i8.shape[1]
    assert K == (b_i8.shape[1] if b_nk else b_i8.shape[0]), (a_i8.shape, b_i8.shape)

    dm, dn, dk = _default_blocks(M, N, K)
    block_m, block_n, block_k = block_m or dm, block_n or dn, block_k or dk
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    if M % bm or N % bn or K % bk or bm % 32 or bn % 128 or bk % 128:
        from llama_x_tpu.ops import int8 as _xla

        fallback = _xla._int8_mm_dequant_nt_xla if b_nk else _xla._int8_mm_dequant_xla
        return fallback(a_i8, b_i8, row_scale, col_scale, out_dtype)

    b_spec = (
        pl.BlockSpec((bn, bk), lambda i, j, k: (j, k))
        if b_nk
        else pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))
    )
    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        functools.partial(_kernel, b_nk=b_nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            b_spec,
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + N * K + M * N * 2,
            transcendentals=0,
        ),
    )(a_i8, b_i8, row_scale.reshape(M, 1), col_scale.reshape(1, N))


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k"))
def int8_mm_dequant_pallas(
    a_i8: jnp.ndarray,
    b_i8: jnp.ndarray,
    row_scale: jnp.ndarray,
    col_scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
):
    """a_i8 [M, K] @ b_i8 [K, N] -> [M, N] out_dtype, dequantized by row/col scales.

    Blocks default to the shape-keyed sweep result (_default_blocks; ~250-370 TOPS on
    the 8B projection shapes, differential timing). Shapes must be multiples of the
    int8 tile (32, 128); falls back to XLA otherwise.
    """
    return _int8_mm_call(a_i8, b_i8, row_scale, col_scale, out_dtype, block_m, block_n, block_k, b_nk=False)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k"))
def int8_mm_dequant_nt_pallas(
    a_i8: jnp.ndarray,
    b_nk_i8: jnp.ndarray,
    row_scale: jnp.ndarray,
    col_scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
):
    """a_i8 [M, K] x b_nk_i8 [N, K] -> [M, N]: the quantized-linear layout (see module
    docstring — this orientation is what keeps the 8B frozen base copy-free)."""
    return _int8_mm_call(a_i8, b_nk_i8, row_scale, col_scale, out_dtype, block_m, block_n, block_k, b_nk=True)
