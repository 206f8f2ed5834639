"""Cross-entropy loss fused into the forward pass.

The reference returns a scalar fp32 F.cross_entropy with ignore_index=-100 when labels
are given (modelling/llama.py:217-219) — loss-in-forward is load-bearing for memory.
Two implementations:

- ``cross_entropy_loss``: plain fp32 log-softmax CE over materialized logits. Fine for
  tiny configs and the oracle for the chunked version.
- ``fused_linear_cross_entropy``: takes the final hidden states + the LM-head kernel and
  computes the CE *without keeping the full [B*S, vocab] fp32 logits live*: a custom_vjp
  processes rows in chunks, recomputing logits per chunk in both passes. For Llama-3's
  128,256-vocab head this cuts peak memory by the full logits tensor (the dominant
  activation at long sequence lengths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_INDEX = -100


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean fp32 CE over positions where labels != -100. logits [..., V], labels [...]."""
    logits = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
    labels = labels.reshape(-1)
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_labels[:, None], axis=-1)[:, 0]
    losses = jnp.where(valid, logz - gold, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(losses) / n


def _chunk(x, i, num_chunks):
    size = x.shape[0] // num_chunks
    return jax.lax.dynamic_slice_in_dim(x, i * size, size, axis=0)


def _match_vma(x, ref):
    """Mark x as varying over the same shard_map manual axes as ref — fresh zeros used
    as loop carries are 'unvarying' and the loop body's output (derived from ref) is
    varying, which scan/fori_loop reject. No-op outside shard_map."""
    try:
        vma = tuple(jax.typeof(ref).vma)
    except Exception:
        return x
    if not vma:
        return x
    try:
        return jax.lax.pcast(x, vma, to="varying")
    except (ValueError, TypeError):
        return x


def _pick_block(dim: int, candidates: tuple[int, ...], multiple: int):
    """Largest candidate block evenly dividing dim (and the int8 tile multiple), or
    None to let the Pallas dispatch fall back to its swept defaults. All static ints —
    shapes are fixed under jit."""
    for c in candidates:
        if dim % c == 0 and c % multiple == 0:
            return c
    return None


def _head_quantized(kernel):
    """Colwise-int8 view of the LM head for the int8 CE path: scale per vocab column,
    so the dequant factors over the logits' vocab axis in the fwd GEMM epilogue AND
    folds into dlogits (which multiplies the vocab contraction) in the backward —
    the same scale-folding trick as the int8 dgrads (ops/int8.py:_int8_linear_bwd)."""
    from llama_x_tpu.ops.int8 import quantize_int8_colwise

    return quantize_int8_colwise(kernel)


def _chunk_logits_int8(h, k_i8, k_scale):
    """f32 logits chunk via the int8 MXU path: rowwise-quantized h x colwise-quantized
    head. Llama-3's 128256 vocab = 2^8*3*167 doesn't divide the swept default blocks,
    so pick aligned ones here (fallback handles the rest)."""
    from llama_x_tpu.ops.int8 import int8_mm_dequant, quantize_int8_rowwise

    h_i8, h_scale = quantize_int8_rowwise(h)
    D, V = k_i8.shape
    return int8_mm_dequant(
        h_i8, k_i8, h_scale, k_scale, out_dtype=jnp.float32,
        block_m=_pick_block(h.shape[0], (512, 256, 128, 64, 32), 32),
        block_n=_pick_block(V, (768, 512, 384, 256, 128), 128),
        block_k=_pick_block(D, (2048, 1024, 512, 256, 128), 128),
    )


def _flce_forward(hidden, kernel, labels, num_chunks, head_int8=False):
    n, _ = hidden.shape
    assert n % num_chunks == 0, f"rows {n} not divisible by num_chunks {num_chunks}"
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    if head_int8:
        k_i8, k_scale = _head_quantized(kernel)

    def body(i, sum_loss):
        h = _chunk(hidden, i, num_chunks)
        lbl = _chunk(safe_labels, i, num_chunks)
        vld = _chunk(valid, i, num_chunks)
        # matmul in the input dtype (bf16 rides the MXU at full rate), fp32 accumulate;
        # the softmax/logsumexp math stays fp32 (≡ the reference's fp32 CE, llama.py:218)
        if head_int8:
            logits = _chunk_logits_int8(h, k_i8, k_scale)
        else:
            logits = jax.lax.dot_general(
                h, kernel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, lbl[:, None], axis=-1)[:, 0]
        return sum_loss + jnp.sum(jnp.where(vld, logz - gold, 0.0))

    sum_loss = jax.lax.fori_loop(0, num_chunks, body, _match_vma(jnp.zeros((), jnp.float32), hidden))
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return sum_loss / n_valid, n_valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_linear_cross_entropy(
    hidden: jnp.ndarray,
    kernel: jnp.ndarray,
    labels: jnp.ndarray,
    num_chunks: int = 8,
    kernel_grad: bool = True,
    head_int8: bool = False,
) -> jnp.ndarray:
    """CE( hidden @ kernel , labels ) computed in row chunks; custom backward.

    hidden: [N, D] (flattened batch*seq), kernel: [D, V], labels: [N] int32.

    kernel_grad=False declares the LM head frozen (QLoRA: the reference freezes
    everything but the adapters, train_metamathqa.py:177, and never adapts the head,
    train_metamathqa.py:178-180 TODO note): the backward then skips the dK GEMM
    (2·N·D·V flops — as large as the dH GEMM) AND the fp32 [D, V] accumulator that
    must otherwise ride the chunk loop carry (2.1 GB at Llama-3 vocab, read+written
    every chunk). The returned dK is zeros; callers must only set this when the
    optimizer mask actually freezes the head, or silently drop the head's training.

    head_int8=True runs the three vocab GEMMs (fwd logits, bwd logits recompute, dH)
    on the int8 MXU path — the head is the last frozen GEMM still riding bf16 when
    the trunk runs dynamic-act int8. Requires kernel_grad=False (the dK GEMM's scales
    don't factor, and an int8 head you're training would be wrong anyway). The head
    is colwise-quantized (per-vocab scale) fresh each pass — lossy only in the int8
    rounding of K and of the per-chunk activations/dlogits rows."""
    if head_int8 and kernel_grad:
        raise ValueError("head_int8 requires kernel_grad=False (frozen LM head)")
    return _flce_forward(hidden, kernel, labels, num_chunks, head_int8)[0]


def _flce_fwd(hidden, kernel, labels, num_chunks, kernel_grad, head_int8):
    loss, n_valid = _flce_forward(hidden, kernel, labels, num_chunks, head_int8)
    return loss, (hidden, kernel, labels, n_valid)


def _flce_bwd(num_chunks, kernel_grad, head_int8, res, g):
    from llama_x_tpu.ops.int8 import int8_mm_dequant_nt, quantize_int8_rowwise

    hidden, kernel, labels, n_valid = res
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    size = hidden.shape[0] // num_chunks
    vocab = kernel.shape[1]
    if head_int8:
        k_i8, k_scale = _head_quantized(kernel)
        k_scale_f32 = k_scale.astype(jnp.float32)

    def body(i, acc):
        dh, dk = acc
        h = _chunk(hidden, i, num_chunks)
        lbl = _chunk(safe_labels, i, num_chunks)
        vld = _chunk(valid, i, num_chunks).astype(jnp.float32)
        if head_int8:
            logits = _chunk_logits_int8(h, k_i8, k_scale)
        else:
            logits = jax.lax.dot_general(
                h, kernel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        probs = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(lbl, vocab, dtype=jnp.float32)
        if head_int8:
            # dH = dlogits @ K^T with K = K_i8 * s_v: fold s_v into dlogits BEFORE the
            # rowwise quant (it multiplies the vocab contraction dim), then run the NT
            # kernel against K_i8 in its stored [D, V] layout — no transpose in the graph
            dlogits = (probs - onehot) * vld[:, None] * k_scale_f32[None, :]
            dl_i8, dl_scale = quantize_int8_rowwise(dlogits)
            D = kernel.shape[0]
            dh_chunk = int8_mm_dequant_nt(
                dl_i8, k_i8, dl_scale, jnp.ones((D,), jnp.float32), out_dtype=jnp.float32,
                block_m=_pick_block(size, (512, 256, 128, 64, 32), 32),
                block_n=_pick_block(D, (1024, 512, 256, 128), 128),
                block_k=_pick_block(vocab, (768, 512, 384, 256, 128), 128),
            )
            dh = jax.lax.dynamic_update_slice_in_dim(dh, dh_chunk, i * size, axis=0)
            return (dh, dk)
        dlogits = ((probs - onehot) * vld[:, None]).astype(hidden.dtype)  # [size, V]
        dh_chunk = jax.lax.dot_general(
            dlogits, kernel, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dh = jax.lax.dynamic_update_slice_in_dim(dh, dh_chunk, i * size, axis=0)
        if kernel_grad:
            dk = dk + jax.lax.dot_general(
                h, dlogits, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        return (dh, dk)

    dh0 = _match_vma(jnp.zeros(hidden.shape, jnp.float32), hidden)
    # frozen head: a [1, 1] placeholder keeps the carry structure without hauling a
    # [D, V] fp32 accumulator through every chunk iteration
    dk0 = _match_vma(
        jnp.zeros(kernel.shape if kernel_grad else (1, 1), jnp.float32), hidden
    )
    dh, dk = jax.lax.fori_loop(0, num_chunks, body, (dh0, dk0))
    scale = g / n_valid.astype(jnp.float32)
    dlabels = np.zeros(labels.shape, dtype=jax.dtypes.float0)  # int primal → float0 cotangent
    dkernel = (
        (dk * scale).astype(kernel.dtype)
        if kernel_grad
        else jnp.zeros(kernel.shape, kernel.dtype)
    )
    return (dh * scale).astype(hidden.dtype), dkernel, dlabels


fused_linear_cross_entropy.defvjp(_flce_fwd, _flce_bwd)
