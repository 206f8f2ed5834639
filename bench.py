"""Headline benchmark — BASELINE.json north star at FULL scale: Llama-3.1-8B-geometry
QLoRA (int8 frozen base + LoRA) early-fusion prefix-LM training, 40 s audio windows
(2000 audio tokens) + text to seq 4096, on one TPU chip.

The full production path runs inside ONE jitted step: mel frontend + conv stem,
Pallas flash attention (prefix-LM mask), dynamic-activation-quant Pallas int8 MXU
GEMMs for the frozen base, LoRA adapters, remat ("flash" policy: only attention
outputs+lse saved — the memory point that fits 8B at S=4096 in 16 GB), chunked fused
CE over the 128k vocab, AdamW on the LoRA params.

Weights are generated ON-DEVICE (the tunneled host→device path is ~5 MB/s; shipping
8 GB would take ~25 min).

MFU accounting is honest for QLoRA fine-tuning: frozen matmuls count 4 FLOPs/param/tok
(fwd + input-grad only — no weight grad exists), trainable LoRA 6, attention 3x its
causal forward; remat recompute is NOT counted. Denominator = v5e bf16 peak.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline = MFU / 0.45 (BASELINE.md: MFU >= 45% on the 8B config => >= 1.0).

`python bench.py --model 1b` runs the round-1 1.1B bf16 proxy instead.
"""

from __future__ import annotations

import json

import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak bf16 matmul throughput per chip
PEAK_FLOPS = 197e12


def qlora_step_flops(config, text_len: int, n_lora: int) -> float:
    """Useful FLOPs per optimizer step (see module docstring for the accounting)."""
    D, L, F = config.embed_dim, config.num_layers, config.intermediate_dim
    H, hd, Hkv, V = config.num_heads, config.head_dim, config.num_kv_heads, config.vocab_size
    S = config.max_seq_len
    p_attn = D * (H * hd) * 2 + D * (Hkv * hd) * 2
    p_mlp = 3 * D * F
    trunk = S * 4.0 * L * (p_attn + p_mlp)  # frozen: fwd 2 + dgrad 2
    head = text_len * 4.0 * D * V  # frozen head (loss covers text positions only)
    lora = S * 6.0 * n_lora
    attn = L * 12.0 * S * S * (H * hd) * 0.5  # fwd 4 * S^2*Dh*0.5 causal, bwd 2x
    return trunk + head + lora + attn


# dgrads through the frozen int8 base on the int8 MXU path (ops/int8.py
# dynamic_int8_bwd); --no_int8_bwd reverts to bf16 dgrads for comparison
INT8_BWD = True
# remat policy for the 8B step; "flash_q8s" saves the flash residuals + h1 rowwise-
# int8 (h3 recomputed with one GEMM — models/llama.py feed_forward_q8s): measured
# 898.6 vs 933.5 ms against flash_proj in ablation and 897 ms / 74.97% MFU in the
# driver-shaped bench (2026-08-18); the full-q8 variants OOM at 8B/S=4096
REMAT = "flash_q8s"
# fused-CE vocab GEMMs (fwd logits, bwd recompute, dH) on the int8 MXU path — the
# frozen head is the last bf16 GEMM in the step; --no_int8_head reverts
INT8_HEAD = True


def build_8b_qlora():
    """Llama-3.1-8B geometry, int8 base + LoRA, generated on-device."""
    from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
    from llama_x_tpu.models import llama
    from llama_x_tpu.models.audio import AudioConfig, init_audio_stem

    config = llama.LlamaConfig(
        embed_dim=4096, num_layers=32, head_dim=128, num_heads=32, num_kv_heads=8,
        intermediate_dim=14336, max_seq_len=4096, vocab_size=128_256,
        rope_base=500_000.0, is_llama3_1=True,
        activation_checkpointing=True, remat_policy=REMAT,
        fused_ce_chunks=8, attn_impl="auto", dynamic_int8_act=True,
        dynamic_int8_bwd=INT8_BWD,
        # head is in freeze_prefixes below: the fused-CE backward skips the dK GEMM
        # and its [D, V] fp32 chunk-loop accumulator (both otherwise computed and
        # then discarded by the optimizer mask)
        frozen_head=True,
        int8_head=INT8_HEAD,
    )
    L, D = config.num_layers, config.embed_dim
    HD, NH, NKV, F, V = config.head_dim, config.num_heads, config.num_kv_heads, config.intermediate_dim, config.vocab_size

    kit = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    def qlin(fan_in, fan_out):
        k = next(kit)
        int_data = jax.jit(
            lambda k: jax.random.randint(k, (L, fan_out, fan_in), -127, 128, jnp.int8)
        )(k)
        # scale chosen so dequantized weights have std ~= 0.02/sqrt(fan_in) (uniform
        # int8 has std ~73.3): activations stay sane and the loss is finite — a bigger
        # scale compounds ~46x gain per matmul and overflows the bf16 residual stream
        s = 0.02 / (73.3 * fan_in**0.5)
        return {"int_data": int_data, "scale": jnp.full((L, fan_out), s, jnp.bfloat16)}

    def emb(shape):
        return jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(jnp.bfloat16))(next(kit))

    params = {
        "tok_embeddings": {"weight": emb((V, D))},
        "layers": {
            "attention_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attention": {"wq": qlin(D, NH * HD), "wk": qlin(D, NKV * HD), "wv": qlin(D, NKV * HD), "wo": qlin(NH * HD, D)},
            "ffn_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "feed_forward": {"w1": qlin(D, F), "w3": qlin(D, F), "w2": qlin(F, D)},
        },
        "norm": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "output": {"kernel": emb((D, V))},
    }
    audio_config = AudioConfig()
    params["audio_embed"] = init_audio_stem(next(kit), config, audio_config, jnp.bfloat16)
    params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", next(kit)))
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm", "audio_embed"))
    return config, audio_config, params, mask


def bench_8b():
    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step
    from llama_x_tpu.utils.tree import trainable_param_count

    t0 = time.perf_counter()
    config, audio_config, params, mask = build_8b_qlora()
    n_lora, n_frozen = trainable_param_count(params, mask)
    build_s = time.perf_counter() - t0

    audio_secs = 40.0
    n_audio_tok = audio_config.num_audio_tokens(int(audio_secs * audio_config.sample_rate))
    text_len = config.max_seq_len - n_audio_tok  # 2096

    def loss_fn(p, mb):
        loss = audio_mod.forward(
            p, config, audio_config, mb["audio"], mb["tokens"], labels=mb["labels"], prefix_lm=True
        )
        return loss, jnp.sum(mb["labels"] != -100)

    tx = get_optimizer("AdamW", 1e-4)
    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((1, 1, int(audio_secs * 16_000))).astype(np.float32) * 0.1),
        "tokens": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, text_len)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, text_len)).astype(np.int32)),
    }

    # NOTE: jax.block_until_ready does not sync on the tunneled TPU backend — force a
    # device->host transfer (float()) instead; each iteration consumes the previous
    # state so the final transfer fences the chain.
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    n_iters = 8
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch)
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    flops = qlora_step_flops(config, text_len, n_lora)
    mfu = flops / dt / PEAK_FLOPS

    # Utilization companion (VERDICT r4 weak #5): as more of the step runs int8 (base
    # GEMMs, dgrads, CE head) the bf16-denominated MFU understates remaining headroom.
    # Trace 2 steps and aggregate per-op achieved/roofline into ONE step-level
    # utilization so the headline can't drift from the roofline. Best-effort: the
    # tunneled profiler is flaky, and the headline must survive its failure.
    util = avail_ms = None
    import os
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        try:
            import tempfile

            from llama_x_tpu.train.xprof import op_details, roofline

            td = tempfile.mkdtemp(prefix="bench_trace_")
            with jax.profiler.trace(td):
                for _ in range(2):
                    state, metrics = step(state, batch)
                float(metrics["loss"])
            rl = roofline(op_details(td), steps=2)
            if rl["sol_speedup"]:
                util = round(1.0 / rl["sol_speedup"], 4)
                avail_ms = rl["available_ms"]
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "mfu_8b_qlora_prefix_lm",
                "value": round(mfu, 4),
                "unit": "MFU (useful-FLOPs / bf16 peak)",
                "vs_baseline": round(mfu / 0.45, 4),
                # achieved/speed-of-light aggregated over every profiled op (honest
                # per-dtype peaks: int8 ops vs int8 peak) — the companion number that
                # cannot exceed 1.0 and tracks the roofline directly
                "utilization_vs_op_rooflines": util,
                "roofline_available_ms_per_step": avail_ms,
                "tokens_per_sec_per_chip": round(config.max_seq_len / dt, 1),
                "audio_secs_per_second": round(audio_secs / dt, 2),
                "step_time_ms": round(dt * 1e3, 2),
                "compile_s": round(compile_s, 1),
                "build_s": round(build_s, 1),
                "loss": round(final_loss, 4),
                "trainable_params": int(n_lora),
                "frozen_params": int(n_frozen),
                "model": "Llama-3.1-8B geometry, int8 base (dynamic-act Pallas GEMM) + LoRA, "
                f"40s-audio prefix-LM, {REMAT} remat, fused CE, seq 4096, bf16",
            }
        ),
        flush=True,
    )


def model_flops_per_token(config) -> float:
    """1.1B proxy accounting (6*P full fine-tune) — kept for `--model 1b`."""
    D, L, F, V = config.embed_dim, config.num_layers, config.intermediate_dim, config.vocab_size
    H, hd, Hkv = config.num_heads, config.head_dim, config.num_kv_heads
    p = L * (D * (H * hd) * 2 + D * (Hkv * hd) * 2 + 3 * D * F) + D * V
    S = config.max_seq_len
    return 6.0 * p + L * 12 * S * H * hd * 0.5


def bench_1b():
    from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.models import llama
    from llama_x_tpu.models.audio import AudioConfig, LlamaAudio
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    config = llama.LlamaConfig(
        embed_dim=2048, num_layers=16, head_dim=128, num_heads=16, num_kv_heads=8,
        intermediate_dim=5632, max_seq_len=4096, vocab_size=32_000,
        activation_checkpointing=True, remat_policy="dots_flash", fused_ce_chunks=8,
        attn_impl="auto",
    )
    audio_config = AudioConfig()
    audio_secs = 40.0
    n_audio_tok = audio_config.num_audio_tokens(int(audio_secs * audio_config.sample_rate))
    text_len = config.max_seq_len - n_audio_tok

    model = LlamaAudio.init(jax.random.PRNGKey(0), config, audio_config, dtype=jnp.bfloat16)
    params = dict(model.params, layers=apply_linear_adapter(model.params["layers"], "lora", jax.random.PRNGKey(1)))
    mask = trainable_mask(params)
    tx = get_optimizer("AdamW", 1e-4)

    def loss_fn(p, mb):
        loss = audio_mod.forward(
            p, config, audio_config, mb["audio"], mb["tokens"], labels=mb["labels"], prefix_lm=True
        )
        return loss, jnp.sum(mb["labels"] != -100)

    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((1, 1, int(audio_secs * 16_000))).astype(np.float32) * 0.1),
        "tokens": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, text_len)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, text_len)).astype(np.int32)),
    }

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    mfu = model_flops_per_token(config) * config.max_seq_len / dt / PEAK_FLOPS
    print(
        json.dumps(
            {
                "metric": "audio_text_tokens_per_sec_per_chip",
                "value": round(config.max_seq_len / dt, 1),
                "unit": "tokens/s",
                "vs_baseline": round(mfu / 0.45, 4),
                "mfu": round(mfu, 4),
                "step_time_ms": round(dt * 1e3, 2),
                "audio_secs_per_second": round(audio_secs / dt, 2),
                "compile_s": round(compile_s, 1),
                "loss": round(float(metrics["loss"]), 4),
                "model": "1.1B llama-style, 40s audio prefix-LM, LoRA+remat+fused-CE, bf16",
            }
        )
    )


def main():
    global INT8_BWD, REMAT, INT8_HEAD
    import argparse
    import os
    import subprocess
    import sys

    from llama_x_tpu.utils.backend_probe import wait_for_backend
    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="8b", choices=["8b", "1b"])
    parser.add_argument("--no_int8_bwd", action="store_true",
                        help="bf16 dgrads through the frozen base (pre-int8-bwd behavior)")
    parser.add_argument("--remat", default=REMAT,
                        help="remat policy for the 8B step (flash / flash_qkv / flash_proj / *_q8)")
    parser.add_argument("--no_int8_head", action="store_true",
                        help="bf16 fused-CE vocab GEMMs (pre-int8-head behavior)")
    args = parser.parse_args()
    INT8_BWD = not args.no_int8_bwd
    REMAT = args.remat
    INT8_HEAD = not args.no_int8_head

    diag = {
        "metric": "mfu_8b_qlora_prefix_lm" if args.model == "8b" else "audio_text_tokens_per_sec_per_chip",
        "value": 0.0,
        "unit": "MFU (useful-FLOPs / bf16 peak)" if args.model == "8b" else "tokens/s",
        "vs_baseline": 0.0,
    }

    # The tunneled backend is flaky at first contact (BENCH_r03 died on backend init
    # with no JSON emitted). Gate on a bounded-subprocess health probe with ~10 min of
    # backoff before committing this process to device work, and always emit one JSON
    # line even on final failure so the driver records a diagnostic, not a bare rc=1.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        res = wait_for_backend(budget_s=float(os.environ.get("BENCH_PROBE_BUDGET_S", "600")))
        if not res["ok"]:
            print(json.dumps({**diag, "error": f"TPU backend unavailable: {res['detail']}",
                              "probe_attempts": res["attempts"], "probe_elapsed_s": res["elapsed_s"]}),
                  flush=True)
            sys.exit(1)

    # compile_s in the output JSON reflects the persistent cache state: ~10 min on a
    # true cold start, seconds when ~/.cache/llama_x_tpu holds the executable
    enable_compilation_cache()
    try:
        bench_1b() if args.model == "1b" else bench_8b()
    except Exception as e:  # noqa: BLE001 — emit diagnostics for ANY failure
        if os.environ.get("BENCH_NO_RETRY") != "1":
            # A mid-run backend drop can poison this process's backend object; retry
            # once in a clean process after the backend probes healthy again.
            print(f"[bench] run failed ({type(e).__name__}: {str(e)[:200]}); "
                  "retrying once in a fresh process", file=sys.stderr, flush=True)
            res = wait_for_backend(budget_s=float(os.environ.get("BENCH_PROBE_BUDGET_S", "600")))
            if res["ok"]:
                env = dict(os.environ, BENCH_NO_RETRY="1")
                sys.exit(subprocess.call([sys.executable, os.path.abspath(__file__), *sys.argv[1:]], env=env))
        print(json.dumps({**diag, "error": f"{type(e).__name__}: {str(e)[:400]}"}), flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
