"""Functional Llama-3/3.1 decoder.

Capabilities mirror the reference model (modelling/llama.py): GQA attention with RoPE
(incl. Llama-3.1/3.2 long-context rescale), SwiGLU MLP, pre-RMSNorm blocks, untied or
tied LM head,
fused-loss forward (scalar CE when labels given), per-layer activation checkpointing,
static full-length KV cache for decode. The *design* is idiomatic JAX:

- params are a pytree of dicts; transformer layers are STACKED on a leading axis and the
  trunk is a single ``lax.scan`` over them (one compilation of the block, not N).
- the model is a set of pure functions (``init``, ``forward``, ``trunk``, ...) — no
  module objects, so sharding/LoRA/quantization are plain tree transforms.
- masks are static-shape metadata (``MaskInfo``), never materialized [S, S] bool buffers
  on the hot path (the reference registers a tril buffer, modelling/llama.py:194).
- activation checkpointing is ``jax.checkpoint`` around the scanned block
  (≡ modelling/llama.py:209-212).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention
from llama_x_tpu.ops.cross_entropy import cross_entropy_loss, fused_linear_cross_entropy
from llama_x_tpu.ops.linear import apply_linear, apply_linear_grouped
from llama_x_tpu.ops.norms import rms_norm
from llama_x_tpu.ops.rope import apply_rope, build_rope

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Model hyperparameters (≡ modelling/llama.py:17-29) plus TPU-side knobs."""

    embed_dim: int
    num_layers: int
    head_dim: int
    num_heads: int
    num_kv_heads: int
    intermediate_dim: int
    max_seq_len: int = 2048
    vocab_size: int = 128_256  # Llama3
    attn_dropout: float = 0.0
    rope_base: float = 50_000.0
    is_llama3_1: bool = False
    # Llama-3.1-style rope rescale parameters (read from HF rope_scaling; 3.2 uses
    # factor=32 — silently assuming 8 would corrupt long-context attention)
    rope_scale_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_old_context_len: int = 8192
    # LM head shares the embedding matrix (HF tie_word_embeddings); the params tree
    # then has no output/kernel leaf and gradients flow to the single shared matrix
    tied_embeddings: bool = False
    activation_checkpointing: bool = False
    # --- TPU-native knobs (no reference counterpart) ---
    attn_impl: str = "auto"  # "auto" | "xla" | "flash" | "ring" | "ulysses"
    fused_ce_chunks: int = 0  # 0 = plain CE; >0 = chunked fused-linear CE
    # LM head frozen by the optimizer mask (QLoRA default — the reference freezes
    # everything but adapters and never adapts the head): the fused-CE backward then
    # skips the dK GEMM + its [D, V] fp32 chunk-loop accumulator entirely. Set by the
    # trainers from the actual trainable mask; MUST match it (a trainable head with
    # frozen_head=True silently trains nothing).
    frozen_head: bool = False
    dynamic_int8_act: bool = False  # set by the quantize transform
    dynamic_int8_bwd: bool = False  # int8 MXU dgrads through the frozen base (ops/int8.py)
    # run the fused-CE vocab GEMMs on the int8 MXU path (requires frozen_head — the
    # head is the last frozen GEMM still riding bf16 when the trunk is int8). Lossy
    # only in int8 rounding; quality artifact: runs/int8_head_quality.
    int8_head: bool = False
    norm_eps: float = 1e-5
    # remat policy when activation_checkpointing: "full" recomputes everything;
    # "dots" saves matmul outputs (jax dots_with_no_batch_dims_saveable) — faster
    # backward, ~2x the activation memory of "full"; "dots_flash" additionally saves
    # the flash-attention outputs+lse so the backward never re-runs the fwd kernel;
    # "flash" saves ONLY the flash outputs+lse (~S*D bytes/layer) — the memory point
    # that fits 8B QLoRA at S=4096 on one 16 GB chip while still skipping the
    # attention-forward recompute (the most expensive part of the backward re-run).
    # "flash_q8"/"flash_qkv_q8"/"flash_proj_q8": the base policy for the attention
    # region + the MLP as feed_forward_q8 (h1/h3 saved rowwise-int8, so the backward
    # never re-runs the w1/w3 F-wide GEMMs — see the q8 section below)
    remat_policy: str = "full"

    def replace(self, **kw) -> "LlamaConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(**kw) -> LlamaConfig:
    """A CPU-runnable config for tests (BASELINE config 1)."""
    base = dict(
        embed_dim=64,
        num_layers=2,
        head_dim=16,
        num_heads=4,
        num_kv_heads=2,
        intermediate_dim=128,
        max_seq_len=128,
        vocab_size=256,
    )
    base.update(kw)
    return LlamaConfig(**base)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_linear(key, fan_in: int, fan_out: int, dtype) -> Params:
    # kaiming-uniform(a=sqrt(5)) over fan_in — torch nn.Linear default init
    bound = (6.0 / ((1 + 5.0) * fan_in)) ** 0.5
    k = jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -bound, bound)
    return {"kernel": k.astype(dtype)}


def init(key: jax.Array, config: LlamaConfig, dtype=jnp.bfloat16) -> Params:
    """Random init (tests / from-scratch). HF import builds the same tree from weights."""
    c = config
    keys = iter(jax.random.split(key, 16))

    def stack_linear(k, fan_in, fan_out):
        ks = jax.random.split(k, c.num_layers)
        return {"kernel": jnp.stack([_init_linear(ks[i], fan_in, fan_out, dtype)["kernel"] for i in range(c.num_layers)])}

    d, hd, nh, nkv, ffn = c.embed_dim, c.head_dim, c.num_heads, c.num_kv_heads, c.intermediate_dim
    params = {
        "tok_embeddings": {
            "weight": (jax.random.normal(next(keys), (c.vocab_size, d), jnp.float32)).astype(dtype)
        },
        "layers": {
            "attention_norm": {"scale": jnp.ones((c.num_layers, d), dtype)},
            "attention": {
                "wq": stack_linear(next(keys), d, nh * hd),
                "wk": stack_linear(next(keys), d, nkv * hd),
                "wv": stack_linear(next(keys), d, nkv * hd),
                "wo": stack_linear(next(keys), nh * hd, d),
            },
            "ffn_norm": {"scale": jnp.ones((c.num_layers, d), dtype)},
            "feed_forward": {
                "w1": stack_linear(next(keys), d, ffn),
                "w3": stack_linear(next(keys), d, ffn),
                "w2": stack_linear(next(keys), ffn, d),
            },
        },
        "norm": {"scale": jnp.ones((d,), dtype)},
    }
    if not c.tied_embeddings:
        params["output"] = _init_linear(next(keys), d, c.vocab_size, dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def attention(
    p: Params,
    config: LlamaConfig,
    x: jnp.ndarray,
    rope: jnp.ndarray,
    mask_info: MaskInfo,
    cache: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    input_pos: jnp.ndarray | None = None,
    prefill: bool = False,
    dropout_rng: jax.Array | None = None,
):
    """GQA attention (≡ modelling/llama.py:93-140). x: [B, S, D].

    When ``cache`` is given, k/v are scattered into the static full-length cache at
    ``input_pos`` and attention runs over the whole cache (decode path,
    ≡ modelling/llama.py:126-127, KVCache.update llama.py:83-90). ``prefill`` also
    writes the cache but attends over the FRESH k/v — identical result when the cache
    starts empty at position 0, O(P^2) instead of O(P * max_seq_len), and eligible for
    the flash kernel. ``dropout_rng`` enables attention dropout (config.attn_dropout,
    ≡ modelling/llama.py:136 training-only dropout) on the XLA path.
    Returns (out, new_cache).
    """
    c = config
    B, S, _ = x.shape
    from jax.ad_checkpoint import checkpoint_name

    # names are no-ops unless the remat policy saves them ("flash_qkv"): saving the
    # three projection outputs (~48 MB/layer at 8B) lets the backward skip their
    # int8-GEMM recompute
    q, k, v = apply_linear_grouped(
        x, (p["wq"], p["wk"], p["wv"]),
        dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd,
    )
    q = checkpoint_name(q, "qkv_proj").reshape(B, S, c.num_heads, c.head_dim)
    k = checkpoint_name(k, "qkv_proj").reshape(B, S, c.num_kv_heads, c.head_dim)
    v = checkpoint_name(v, "qkv_proj").reshape(B, S, c.num_kv_heads, c.head_dim)

    if input_pos is None:
        q = apply_rope(q, rope)
        k = apply_rope(k, rope)
    else:
        q = apply_rope(q, rope, positions=input_pos)
        k = apply_rope(k, rope, positions=input_pos)

    new_cache = None
    decode_from_cache = False
    quantized_cache = False
    if cache is not None:
        k_cache, v_cache = cache  # [B, n_kv, max_seq_len, hd] (contiguous per-head rows)
        assert input_pos is not None
        quantized_cache = isinstance(k_cache, tuple)  # int8 side: (data, rowwise scale)
        # input_pos [S]: all rows at the same depth (plain decode/prefill). [B, S]:
        # per-row depths (batched speculative — rows desynchronize as acceptance
        # varies); the write becomes a per-row scatter (vmapped dynamic_update_slice).
        per_row = input_pos.ndim == 2

        def put(buf, fresh, trailing_dims):
            if per_row:
                starts = input_pos[:, 0]
                zeros = (0,) * trailing_dims
                return jax.vmap(
                    lambda c, f, s: jax.lax.dynamic_update_slice(c, f, (0, s, *zeros))
                )(buf, fresh, starts)
            return jax.lax.dynamic_update_slice(
                buf, fresh, (0, 0, input_pos[0]) + (0,) * trailing_dims
            )

        if quantized_cache:

            def update(side, fresh):
                data, scale = side
                f_i8, f_s = quantize_kv_rows(fresh.transpose(0, 2, 1, 3))
                return put(data, f_i8, 1), put(scale, f_s, 0)

        else:

            def update(side, fresh):
                return put(side, fresh.transpose(0, 2, 1, 3).astype(side.dtype), 1)

        k_cache = update(k_cache, k)
        v_cache = update(v_cache, v)
        new_cache = (k_cache, v_cache)
        decode_from_cache = not prefill

    if decode_from_cache:
        # small-Sq decode over the static cache (Sq=1 plain decode, Sq=2 speculative
        # draft pair, Sq=gamma+1 verify): the Pallas decode kernel reads only the live
        # kv_len prefix, in the cache's own [B, Hkv, S, D] layout (O(kv_len)
        # contiguous HBM traffic, ops/decode_attention.py), with a per-query causal
        # staircase for Sq > 1
        from llama_x_tpu.ops import decode_attention as da

        cache_shape = k_cache[0].shape if quantized_cache else k_cache.shape
        if config.attn_impl != "xla" and da.decode_supported(q.shape, cache_shape, mask_info):
            lens = da.effective_lens(mask_info, B, S)
            if quantized_cache:
                out = da.decode_attention_int8(
                    q, k_cache[0], k_cache[1], v_cache[0], v_cache[1], lens, 1.0 / c.head_dim**0.5
                )
            else:
                out = da.decode_attention(q, k_cache, v_cache, lens, 1.0 / c.head_dim**0.5)
        else:
            kd = dequant_kv(k_cache) if quantized_cache else k_cache
            vd = dequant_kv(v_cache) if quantized_cache else v_cache
            out = dot_product_attention(
                q, kd.transpose(0, 2, 1, 3), vd.transpose(0, 2, 1, 3), mask_info
            )
        out = out.reshape(B, S, c.num_heads * c.head_dim)
        return apply_linear(out, p["wo"], dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd), new_cache

    use_dropout = config.attn_dropout > 0.0 and dropout_rng is not None
    use_flash = (
        config.attn_impl == "flash"
        or (config.attn_impl == "auto" and jax.default_backend() == "tpu")
    )
    if config.attn_impl in ("ring", "ulysses") and cache is None:
        # context parallelism: sequence sharded over the ambient mesh's "cp" axis.
        # "ring": KV blocks rotate the ICI ring (ops/ring_attention.py). "ulysses":
        # one all-to-all scatters heads / gathers sequence, local flash attention,
        # one all-to-all back (parallel/ulysses.py) — less traffic when heads allow.
        if use_dropout:
            raise NotImplementedError(
                f"attention dropout is not supported with attn_impl={config.attn_impl!r}"
            )
        from llama_x_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        assert mesh is not None, (
            f"attn_impl={config.attn_impl!r} needs parallel.use_mesh(mesh) around the step"
        )
        if config.attn_impl == "ring":
            from llama_x_tpu.parallel.context import context_parallel_attention

            out = context_parallel_attention(q, k, v, mesh, mask_info)
        else:
            from llama_x_tpu.parallel.ulysses import ulysses_attention

            out = ulysses_attention(q, k, v, mesh, mask_info)
    elif use_flash:
        from llama_x_tpu.ops.flash_attention import flash_attention

        # dropout runs IN-KERNEL (TPU PRNG) on the flash path (≡ modelling/llama.py:136)
        out = flash_attention(
            q, k, v, mask_info,
            dropout_rate=c.attn_dropout if use_dropout else 0.0, dropout_rng=dropout_rng,
        )
    else:
        out = dot_product_attention(
            q, k, v, mask_info,
            dropout_rate=c.attn_dropout if use_dropout else 0.0, dropout_rng=dropout_rng,
        )

    out = out.reshape(B, S, c.num_heads * c.head_dim)
    out = checkpoint_name(
        apply_linear(out, p["wo"], dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd),
        "o_proj",
    )
    return out, new_cache


def feed_forward(p: Params, config: LlamaConfig, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: w2(silu(w1 x) * w3 x) (≡ modelling/llama.py:143-152)."""
    from jax.ad_checkpoint import checkpoint_name

    d, db = config.dynamic_int8_act, config.dynamic_int8_bwd
    h1, h3 = apply_linear_grouped(x, (p["w1"], p["w3"]), dynamic_int8_act=d, dynamic_int8_bwd=db)
    h = jax.nn.silu(h1) * h3
    # named for the "flash_proj" remat policy: w2's output is D-wide (32 MB/layer at
    # 8B) while skipping its recompute saves the single largest GEMM in the block
    return checkpoint_name(apply_linear(h, p["w2"], dynamic_int8_act=d, dynamic_int8_bwd=db), "mlp_out")


# ---------------------------------------------------------------------------
# int8-residual feed-forward (the "*_q8" remat policies)
#
# Under "flash_proj" the backward still RE-RUNS the w1/w3 F-wide GEMMs every layer:
# their outputs feed the SwiGLU derivative and at 8B/S=4096 are 7.5 GB in bf16 —
# too big to save. Saved rowwise-int8 they are 1.9 GB, and the backward can compute
# dSwiGLU from the dequantized values instead of recomputing two S x D x F GEMMs
# per layer (~30 TFLOP/step of replay at 8B). The int8 roundtrip perturbs only the
# BACKWARD's view of h1/h3 (forward output is computed from the exact values) —
# the same error class as dynamic_int8_bwd, which runs/int8_bwd_quality bounds.
#
# Mechanically this cannot be a jax.checkpoint policy: policies pick which primal
# intermediates to SAVE, they cannot re-encode them, and residuals produced inside
# a custom_vjp fwd are invisible to save_only_these_names. So the feed-forward
# becomes its own custom_vjp with int8 residuals, placed OUTSIDE the attention
# checkpoint region by trunk() (see the _Q8_POLICIES branch).
# ---------------------------------------------------------------------------

import functools as _functools


def _silu_prime(h, sig):
    # d/dh [h * sigmoid(h)] = sig * (1 + h * (1 - sig))
    return sig * (1 + h * (1 - sig))


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def feed_forward_q8(config: LlamaConfig, p: Params, norm_scale: jnp.ndarray, h: jnp.ndarray):
    """rms_norm + SwiGLU with int8-rowwise backward residuals (h1/h3 saved as int8).

    Takes the PRE-norm residual stream h and folds the ffn_norm inside so the only
    full-width residuals are h itself plus the two int8 tensors; the norm recomputes
    in the backward (VPU-cheap)."""
    x = rms_norm(h, norm_scale, config.norm_eps)
    d, db = config.dynamic_int8_act, config.dynamic_int8_bwd
    h1, h3 = apply_linear_grouped(x, (p["w1"], p["w3"]), dynamic_int8_act=d, dynamic_int8_bwd=db)
    return apply_linear(jax.nn.silu(h1) * h3, p["w2"], dynamic_int8_act=d, dynamic_int8_bwd=db)


def _ff_q8_fwd(config, p, norm_scale, h):
    from llama_x_tpu.ops.int8 import quantize_int8_rowwise

    x = rms_norm(h, norm_scale, config.norm_eps)
    d, db = config.dynamic_int8_act, config.dynamic_int8_bwd
    h1, h3 = apply_linear_grouped(x, (p["w1"], p["w3"]), dynamic_int8_act=d, dynamic_int8_bwd=db)
    out = apply_linear(jax.nn.silu(h1) * h3, p["w2"], dynamic_int8_act=d, dynamic_int8_bwd=db)
    F = h1.shape[-1]
    q1, s1 = quantize_int8_rowwise(h1.reshape(-1, F))
    if config.remat_policy.endswith("_q8s"):
        # single-sided: save h1 only (needed twice in dSwiGLU: silu and silu'); the
        # backward recomputes h3 with ONE w3 GEMM. Halves the int8-residual memory —
        # full q8 at 8B/S=4096 is ~3.8 GB of residuals and runtime-OOMs the 16 GB
        # chip next to flash_proj's ~3.7 GB of bf16 saves (tools/repro_q8_compile.py).
        q3 = s3 = None
    else:
        q3, s3 = quantize_int8_rowwise(h3.reshape(-1, F))
    return out, (p, norm_scale, h, q1, s1, q3, s3)


def _ff_q8_bwd(config, res, g):
    p, norm_scale, h, q1, s1, q3, s3 = res
    d, db = config.dynamic_int8_act, config.dynamic_int8_bwd
    lead, F = h.shape[:-1], q1.shape[-1]

    def deq(q, s):
        return (q.astype(jnp.float32) * s.astype(jnp.float32)[:, None]).astype(h.dtype).reshape(*lead, F)

    def lin(pp, xx):
        return apply_linear(xx, pp, dynamic_int8_act=d, dynamic_int8_bwd=db)

    x_ = rms_norm(h, norm_scale, config.norm_eps)
    h1 = deq(q1, s1)
    # q8s: h3 was not saved — recompute it (exact fwd value, so only h1's int8
    # roundtrip perturbs the backward; one extra F-wide GEMM vs full q8)
    h3 = lin(p["w3"], x_) if q3 is None else deq(q3, s3)
    sig = jax.nn.sigmoid(h1)
    silu_h1 = h1 * sig
    prod = silu_h1 * h3

    # jax.vjp re-traces each forward, but the GEMM outputs are unused and the int8
    # custom_vjp keeps no output residuals, so XLA DCEs the replayed forwards — only
    # the dgrads and LoRA grads materialize here.
    _, vjp2 = jax.vjp(lin, p["w2"], prod)
    dw2, dprod = vjp2(g)
    dh1 = dprod * h3 * _silu_prime(h1, sig)
    dh3 = dprod * silu_h1
    _, vjp1 = jax.vjp(lin, p["w1"], x_)
    dw1, dx1 = vjp1(dh1)
    _, vjp3 = jax.vjp(lin, p["w3"], x_)
    dw3, dx3 = vjp3(dh3)
    _, vjp_n = jax.vjp(lambda hh, sc: rms_norm(hh, sc, config.norm_eps), h, norm_scale)
    dh, dscale = vjp_n(dx1 + dx3)
    return {"w1": dw1, "w2": dw2, "w3": dw3}, dscale, dh


feed_forward_q8.defvjp(_ff_q8_fwd, _ff_q8_bwd)


# ---------------------------------------------------------------------------
# attn_q8: the attention half as its own custom_vjp with int8 residuals.
#
# Under the checkpoint-based q8 policies the backward still RE-RUNS the q/k/v int8
# GEMMs + their act-quant producers + rope to rebuild the flash kernel's inputs
# (flash_residuals saves only out+lse) — measured 92.7 ms/step inside the remat
# region at 8B (runs/profile_8b/top_ops.json checkpoint.10). Saving post-rope
# q/k/v and the flash output as rowwise int8 costs half the bytes of the bf16
# saves that OOM'd (flash_proj_q8s, tools/repro_q8_compile.py) and removes every
# GEMM recompute from the attention backward: what re-runs is one rms_norm (VPU)
# and one rope transpose. Same technique as feed_forward_q8 above — a checkpoint
# policy cannot re-encode saves, so the save-as-int8 needs a manual vjp.
#
# MEASURED NEGATIVE at 8B (2026-08-19, don't re-default without re-measuring):
# attn_q8s benches 887.3 ms vs flash_q8s's 873.9 — the quantize/dequantize passes
# over q/k/v/attn (~8 GB/step of extra HBM traffic) plus the model-layout<->head-
# major transposes the saved-bf16 path avoids cost MORE than the ~25 ms of int8
# GEMM recompute they remove; the recompute rides the MXU while the overhead is
# bandwidth-bound on an already bandwidth-tight step. Kept as a supported variant:
# the trade flips wherever recompute is pricier or HBM is freer (longer S, fatter
# heads, trainable base where the replay can't DCE weight-grad GEMMs).
# ---------------------------------------------------------------------------


def _q8_rows(t):
    """Rowwise int8 over the last axis. Returns (int8 same-shape, scales [leading])."""
    from llama_x_tpu.ops.int8 import quantize_int8_rowwise

    lead = t.shape[:-1]
    q, s = quantize_int8_rowwise(t.reshape(-1, t.shape[-1]))
    return q.reshape(t.shape), s.reshape(lead)


def _q8_deq(q, s, dtype):
    return (q.astype(jnp.float32) * s.astype(jnp.float32)[..., None]).astype(dtype)


@_functools.lru_cache(maxsize=None)
def _make_attention_q8(config: "LlamaConfig", causal: bool, has_seg: bool,
                       has_kvseg: bool, has_prefix: bool):
    from llama_x_tpu.ops.attention import MaskInfo as _MI
    from llama_x_tpu.ops.attention import dot_product_attention as _dpa
    from llama_x_tpu.ops.flash_attention import (
        flash_bwd_from_res,
        flash_fwd_with_lse,
        flash_plan,
    )

    c = config

    def _mi(qseg, kseg, prefix):
        return _MI(
            causal=causal,
            segment_ids=qseg if has_seg else None,
            kv_segment_ids=kseg if has_kvseg else None,
            prefix_len=prefix if has_prefix else None,
        )

    def _compute(p, norm_scale, h, rope, qseg, kseg, prefix):
        B, S, _ = h.shape
        x = rms_norm(h, norm_scale, c.norm_eps)
        q, k, v = apply_linear_grouped(
            x, (p["wq"], p["wk"], p["wv"]),
            dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd,
        )
        q = apply_rope(q.reshape(B, S, c.num_heads, c.head_dim), rope)
        k = apply_rope(k.reshape(B, S, c.num_kv_heads, c.head_dim), rope)
        v = v.reshape(B, S, c.num_kv_heads, c.head_dim)
        mi = _mi(qseg, kseg, prefix)
        plan = flash_plan(q.shape, k.shape, mi)
        if plan is not None:
            out, lse = flash_fwd_with_lse(q, k, v, mi, plan)
        else:
            out, lse = _dpa(q, k, v, mi), None
        attn = out.reshape(B, S, c.num_heads * c.head_dim)
        o = apply_linear(
            attn, p["wo"], dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd
        )
        return o, (q, k, v, attn, lse)

    @jax.custom_vjp
    def f(p, norm_scale, h, rope, qseg, kseg, prefix):
        return _compute(p, norm_scale, h, rope, qseg, kseg, prefix)[0]

    def f_fwd(p, norm_scale, h, rope, qseg, kseg, prefix):
        o, (q, k, v, attn, lse) = _compute(p, norm_scale, h, rope, qseg, kseg, prefix)
        return o, (
            p, norm_scale, h, rope, qseg, kseg, prefix,
            *_q8_rows(q), *_q8_rows(k), *_q8_rows(v), *_q8_rows(attn), lse,
        )

    def f_bwd(res, g):
        (p, norm_scale, h, rope, qseg, kseg, prefix,
         q_i8, q_s, k_i8, k_s, v_i8, v_s, a_i8, a_s, lse) = res
        B, S, _ = h.shape
        dt = h.dtype
        q = _q8_deq(q_i8, q_s, dt)
        k = _q8_deq(k_i8, k_s, dt)
        v = _q8_deq(v_i8, v_s, dt)
        attn = _q8_deq(a_i8, a_s, dt)
        mi = _mi(qseg, kseg, prefix)

        def lin(pp, xx):
            return apply_linear(
                xx, pp, dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd
            )

        _, vjp_o = jax.vjp(lin, p["wo"], attn)
        dwo, dattn = vjp_o(g)
        do = dattn.reshape(B, S, c.num_heads, c.head_dim)

        plan = flash_plan(q.shape, k.shape, mi)
        if plan is not None:
            out4 = attn.reshape(B, S, c.num_heads, c.head_dim)
            dq, dk, dv = flash_bwd_from_res(q, k, v, out4, lse, do, mi, plan)
        else:
            _, vjp_a = jax.vjp(lambda qq, kk, vv: _dpa(qq, kk, vv, mi), q, k, v)
            dq, dk, dv = vjp_a(do)

        # rope is a rotation (linear in q/k): its vjp is primal-independent, so taking
        # it at the dequantized primal is exact
        _, vjp_rq = jax.vjp(lambda t: apply_rope(t, rope), q)
        (dq,) = vjp_rq(dq)
        _, vjp_rk = jax.vjp(lambda t: apply_rope(t, rope), k)
        (dk,) = vjp_rk(dk)

        x = rms_norm(h, norm_scale, c.norm_eps)

        def qkv(pps, xx):
            return apply_linear_grouped(
                xx, pps, dynamic_int8_act=c.dynamic_int8_act, dynamic_int8_bwd=c.dynamic_int8_bwd
            )

        _, vjp_qkv = jax.vjp(qkv, (p["wq"], p["wk"], p["wv"]), x)
        (dwq, dwk, dwv), dx = vjp_qkv(
            (dq.reshape(B, S, -1), dk.reshape(B, S, -1), dv.reshape(B, S, -1))
        )
        _, vjp_n = jax.vjp(lambda hh, sc: rms_norm(hh, sc, c.norm_eps), h, norm_scale)
        dh, dscale = vjp_n(dx)

        def _int_cot(t):
            return None if t is None else np.zeros(t.shape, jax.dtypes.float0)

        return (
            {"wq": dwq, "wk": dwk, "wv": dwv, "wo": dwo}, dscale, dh,
            jnp.zeros_like(rope), _int_cot(qseg), _int_cot(kseg), _int_cot(prefix),
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def attention_q8(config: LlamaConfig, p: Params, norm_scale: jnp.ndarray, h: jnp.ndarray,
                 rope: jnp.ndarray, mask_info) -> jnp.ndarray:
    """rms_norm + GQA attention with rowwise-int8 backward residuals (post-rope q/k/v
    + the pre-o_proj attention output saved int8; no GEMM recompute in the backward).
    Training path only: no cache, no dropout (trunk falls back to the checkpointed
    q8 path when dropout is active)."""
    mi = mask_info
    f = _make_attention_q8(
        config, bool(mi.causal), mi.segment_ids is not None,
        mi.kv_segment_ids is not None, mi.prefix_len is not None,
    )
    # dummies keep the custom_vjp arity fixed; the static flags gate their use
    zi = jnp.zeros((1,), jnp.int32)
    return f(
        p, norm_scale, h, rope,
        mi.segment_ids if mi.segment_ids is not None else zi,
        mi.kv_segment_ids if mi.kv_segment_ids is not None else zi,
        mi.prefix_len if mi.prefix_len is not None else zi,
    )


# q8 remat policies: attention region keeps the mapped policy's saves; the MLP runs
# outside the checkpoint as feed_forward_q8 (int8 residuals replace its recompute).
# "_q8" saves h1+h3 rowwise-int8 (no w1/w3 recompute at all); "_q8s" saves h1 only
# and recomputes h3 (half the residual memory — the 8B/S=4096 fit, see _ff_q8_fwd).
_Q8_POLICIES = {
    "flash_q8": "flash",
    "flash_qkv_q8": "flash_qkv",
    "flash_proj_q8": "flash_proj",  # mlp_out name never appears in the attn region
    "flash_q8s": "flash",
    "flash_qkv_q8s": "flash_qkv",
    "flash_proj_q8s": "flash_proj",
}

# attention_q8 + feed_forward_q8 (no jax.checkpoint anywhere); values = the
# checkpointed fallback when the attention custom_vjp can't apply (dropout)
_ATTN_Q8_POLICIES = {
    "attn_q8": "flash_q8",
    "attn_q8s": "flash_q8s",
}


def block(
    p: Params,
    config: LlamaConfig,
    x: jnp.ndarray,
    rope: jnp.ndarray,
    mask_info: MaskInfo,
    cache=None,
    input_pos=None,
    prefill: bool = False,
    dropout_rng: jax.Array | None = None,
):
    """Pre-norm transformer layer (≡ modelling/llama.py:155-174)."""
    attn_out, new_cache = attention(
        p["attention"], config, rms_norm(x, p["attention_norm"]["scale"], config.norm_eps),
        rope, mask_info, cache, input_pos, prefill=prefill, dropout_rng=dropout_rng,
    )
    x = x + attn_out
    x = x + feed_forward(p["feed_forward"], config, rms_norm(x, p["ffn_norm"]["scale"], config.norm_eps))
    return x, new_cache


def remat_policy(config: LlamaConfig):
    """Checkpoint policy for config.remat_policy — the single definition shared by
    llama.trunk and parallel/pipeline.py (they must not drift)."""
    if config.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if config.remat_policy == "dots_flash":
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("flash_residuals"),
        )
    if config.remat_policy == "flash":
        return jax.checkpoint_policies.save_only_these_names("flash_residuals")
    if config.remat_policy == "flash_qkv":
        # flash residuals + q/k/v projection outputs (~48 MB/layer at 8B, ~1.5 GB for
        # 32 layers): the backward skips recomputing the three projection int8 GEMMs
        # (the names wrap the PRE-rope outputs, so the cheap RoPE rotation still
        # re-runs). Between "flash" (min memory) and "dots_flash" (OOM at 8B).
        return jax.checkpoint_policies.save_only_these_names("flash_residuals", "qkv_proj")
    if config.remat_policy == "flash_proj":
        # additionally save the wo and w2 outputs (each D-wide, +2 GB at 8B): with a
        # frozen base there are no weight grads, so these saves prune the recompute
        # of every D-out GEMM in the block — only w1/w3 re-run (their outputs feed
        # the SwiGLU derivative and are F-wide, 7.5 GB: too big to save)
        return jax.checkpoint_policies.save_only_these_names(
            "flash_residuals", "qkv_proj", "o_proj", "mlp_out"
        )
    if config.remat_policy in _Q8_POLICIES:
        # callers that wrap whole blocks (parallel/pipeline.py) get the mapped base
        # policy; the q8 int8-residual MLP itself only engages through trunk()'s
        # dedicated branch
        return remat_policy(config.replace(remat_policy=_Q8_POLICIES[config.remat_policy]))
    if config.remat_policy in _ATTN_Q8_POLICIES:
        return remat_policy(config.replace(remat_policy=_ATTN_Q8_POLICIES[config.remat_policy]))
    return None


def trunk(
    params: Params,
    config: LlamaConfig,
    x: jnp.ndarray,
    mask_info: MaskInfo,
    kv_cache: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    input_pos: jnp.ndarray | None = None,
    prefill: bool = False,
    dropout_rng: jax.Array | None = None,
):
    """Scan the stacked layers. x: [B, S, D] embeddings. Returns (x, new_kv_cache).

    kv_cache, if given, is a pair of [num_layers, B, n_kv, max_seq_len, hd] arrays
    (see init_kv_cache for the layout rationale).
    """
    rope = build_rope(
        config.max_seq_len,
        config.head_dim,
        config.rope_base,
        config.is_llama3_1,
        scale_factor=config.rope_scale_factor,
        low_freq_factor=config.rope_low_freq_factor,
        high_freq_factor=config.rope_high_freq_factor,
        old_context_len=config.rope_old_context_len,
    )
    if input_pos is None:
        rope = rope[: x.shape[1]]

    layer_params = params["layers"]
    layer_rngs = (
        jax.random.split(dropout_rng, config.num_layers) if dropout_rng is not None else None
    )

    if kv_cache is None:
        if (
            config.activation_checkpointing
            and config.remat_policy in _ATTN_Q8_POLICIES
            and layer_rngs is None  # attention_q8 has no dropout path
        ):
            # fully checkpoint-free layer: BOTH halves are custom_vjps with explicit
            # int8 residuals — the backward re-runs no GEMM at all (see attention_q8)
            def body(carry, scanned):
                p, _rng = scanned
                h = carry + attention_q8(
                    config, p["attention"], p["attention_norm"]["scale"], carry, rope, mask_info
                )
                return h + feed_forward_q8(config, p["feed_forward"], p["ffn_norm"]["scale"], h), None

            x, _ = jax.lax.scan(body, x, (layer_params, layer_rngs))
            return x, None

        if config.activation_checkpointing and config.remat_policy in _ATTN_Q8_POLICIES:
            # dropout active: fall back to the checkpointed q8 family (same MLP saves)
            config = config.replace(remat_policy=_ATTN_Q8_POLICIES[config.remat_policy])

        if config.activation_checkpointing and config.remat_policy in _Q8_POLICIES:
            # q8 mode: checkpoint ONLY the attention half; the MLP runs outside the
            # region as feed_forward_q8, whose int8 residuals are what get saved
            # (inside a checkpoint region its residuals would be recomputed from
            # scratch — w1/w3 GEMMs and all — which is exactly what q8 avoids)
            attn_cfg = config.replace(remat_policy=_Q8_POLICIES[config.remat_policy])

            def attn_part(p, carry, rng):
                out, _ = attention(
                    p["attention"], config,
                    rms_norm(carry, p["attention_norm"]["scale"], config.norm_eps),
                    rope, mask_info, dropout_rng=rng,
                )
                return carry + out

            attn_part = jax.checkpoint(attn_part, prevent_cse=False, policy=remat_policy(attn_cfg))

            def body(carry, scanned):
                p, rng = scanned
                h = attn_part(p, carry, rng)
                return h + feed_forward_q8(config, p["feed_forward"], p["ffn_norm"]["scale"], h), None

            x, _ = jax.lax.scan(body, x, (layer_params, layer_rngs))
            return x, None

        def body(carry, scanned):
            p, rng = scanned
            out, _ = block(p, config, carry, rope, mask_info, dropout_rng=rng)
            return out, None

        if config.activation_checkpointing:
            body = jax.checkpoint(body, prevent_cse=False, policy=remat_policy(config))
        x, _ = jax.lax.scan(body, x, (layer_params, layer_rngs))
        return x, None

    def body(carry, scanned):
        p, rng, ck, cv = scanned
        out, new_cache = block(
            p, config, carry, rope, mask_info, cache=(ck, cv), input_pos=input_pos,
            prefill=prefill, dropout_rng=rng,
        )
        return out, new_cache

    x, (new_k, new_v) = jax.lax.scan(body, x, (layer_params, layer_rngs, kv_cache[0], kv_cache[1]))
    return x, (new_k, new_v)


def head(params: Params, config: LlamaConfig, x: jnp.ndarray, labels: jnp.ndarray | None = None):
    """Final norm + LM head; fused loss when labels given (≡ modelling/llama.py:216-219).

    With tied_embeddings the head kernel IS the embedding matrix transposed — one shared
    weight, shared gradient (HF tie_word_embeddings semantics)."""
    x = rms_norm(x, params["norm"]["scale"], config.norm_eps)
    if config.tied_embeddings:
        kernel = params["tok_embeddings"]["weight"].T  # [D, V] view of the shared matrix
    else:
        kernel = params["output"]["kernel"]
    if labels is not None and config.fused_ce_chunks > 0:
        n = x.shape[0] * x.shape[1]
        return fused_linear_cross_entropy(
            x.reshape(n, -1), kernel, labels.reshape(n), config.fused_ce_chunks,
            not config.frozen_head, config.int8_head and config.frozen_head,
        )
    logits = x @ kernel.astype(x.dtype)
    if labels is not None:
        return cross_entropy_loss(logits, labels)
    return logits


def forward(
    params: Params,
    config: LlamaConfig,
    tokens: jnp.ndarray,
    *,
    segment_ids: jnp.ndarray | None = None,
    labels: jnp.ndarray | None = None,
    kv_cache=None,
    input_pos: jnp.ndarray | None = None,
    kv_len: jnp.ndarray | None = None,
    dropout_rng: jnp.ndarray | None = None,
):
    """Training/prefill/decode forward (≡ Llama.forward, modelling/llama.py:196-219).

    - training: tokens [B, S] (+ optional segment_ids for packed document masking,
      + labels for the fused scalar loss).
    - decode: kv_cache + input_pos [S] + kv_len [B]; attention over the full cache.
    Returns logits [B, S, V] or scalar loss; and the new kv_cache when one was passed.
    """
    x = jnp.take(params["tok_embeddings"]["weight"], tokens, axis=0)

    if kv_cache is not None:
        q_pos = input_pos[None, :] if input_pos is not None else None
        mask_info = MaskInfo(causal=True, q_positions=q_pos, kv_len=kv_len)
    else:
        mask_info = MaskInfo(causal=True, segment_ids=segment_ids)

    x, new_cache = trunk(params, config, x, mask_info, kv_cache, input_pos, dropout_rng=dropout_rng)
    out = head(params, config, x, labels)
    if kv_cache is not None:
        return out, new_cache
    return out


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(config: LlamaConfig, batch_size: int, dtype=jnp.bfloat16):
    """Static full-length cache (≡ KVCache, modelling/llama.py:76-90), stacked per layer.

    Layout [L, B, n_kv, S, hd]: decode reads the whole live cache every token, so each
    per-head [block, hd] tile must be CONTIGUOUS for the Pallas decode kernel's DMAs
    (a [B, S, n_kv, hd] cache serves 256-byte rows at 2 KB stride — measured slower
    than the XLA path). The scatter at input_pos writes one strided row per head per
    token, which is noise next to the read traffic.

    ``dtype=jnp.int8``: quantized cache — each side becomes a pair
    ``(int8 [L, B, n_kv, S, hd], f32 scale [L, B, n_kv, S])`` (symmetric rowwise over
    hd per cached position, the ops/int8.py convention). Halves decode's cache HBM
    traffic and doubles the max context that fits; the decode kernel dequantizes
    tiles in VMEM (ops/decode_attention.py:decode_attention_int8). Scales are f32
    (~hd/4 x smaller than the data — precision is free here).
    """
    shape = (config.num_layers, batch_size, config.num_kv_heads, config.max_seq_len, config.head_dim)
    if dtype == jnp.int8:
        side = lambda: (jnp.zeros(shape, jnp.int8), jnp.zeros(shape[:-1], jnp.float32))
        return side(), side()
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def quantize_kv_rows(x: jnp.ndarray):
    """[..., D] float -> (int8 [..., D], f32 scale [...]): symmetric absmax/127 per row
    (quantize_int8_rowwise generalized to any leading shape, f32 scale out)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    q = jnp.rint(xf / jnp.clip(scale, 1e-12, None)[..., None]).astype(jnp.int8)
    return q, scale


def dequant_kv(side) -> jnp.ndarray:
    """Quantized cache side (int8 data, f32 scale) -> bf16 [..., S, D] (XLA fallback /
    prefill read path)."""
    data, scale = side
    return (data.astype(jnp.float32) * scale[..., None]).astype(jnp.bfloat16)


class Llama:
    """Thin OO convenience wrapper over the functional API (used by trainers/tests).

    Holds (params, config); all compute goes through the pure functions above, so this
    wrapper never appears inside jit.
    """

    def __init__(self, params: Params, config: LlamaConfig):
        self.params = params
        self.config = config

    @classmethod
    def init(cls, key, config: LlamaConfig, dtype=jnp.bfloat16) -> "Llama":
        return cls(init(key, config, dtype), config)

    @classmethod
    def from_hf(cls, model_id_or_path: str, **kwargs) -> "Llama":
        from llama_x_tpu.models.hf import load_llama

        params, config = load_llama(model_id_or_path, **kwargs)
        return cls(params, config)

    def __call__(self, tokens, **kw):
        return forward(self.params, self.config, tokens, **kw)
