"""Measured omni (audio + image + text) train step at 8B geometry — BASELINE config 5's
perf evidence (VERDICT r2 next-step #2), sibling to bench.py's headline config 4.

Same production stack as the headline bench (Llama-3.1-8B geometry, int8 frozen base
via the dynamic-act Pallas GEMM, LoRA, flash remat, fused CE) with BOTH modality
prefixes in one prefix-LM sequence: 30 s audio (1500 audio tokens) + one 224x224 image
(256 patches + 16 newline tokens = 272 image tokens) + 2324 text tokens = seq 4096.

Writes runs/bench_omni/omni_step.json and prints the same record.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_omni.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bench import PEAK_FLOPS, build_8b_qlora, qlora_step_flops
from llama_x_tpu.adapters import trainable_mask
from llama_x_tpu.models import omni as omni_mod
from llama_x_tpu.models.vision import VisionConfig, init_patch_embed
from llama_x_tpu.train.optim import get_optimizer
from llama_x_tpu.train.trainer import init_train_state, make_train_step
from llama_x_tpu.utils.tree import trainable_param_count

AUDIO_SECS = 30.0


def main():
    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    t0 = time.perf_counter()
    config, audio_config, params, _ = build_8b_qlora()
    vision_config = VisionConfig()  # 224 / 14 -> 272 image tokens
    params["patch_embed"] = init_patch_embed(jax.random.PRNGKey(42), config, vision_config, jnp.bfloat16)
    # same freeze policy as the headline bench: LoRA trains, base + stems frozen
    mask = trainable_mask(
        params, freeze_prefixes=("tok_embeddings", "output", "norm", "audio_embed", "patch_embed")
    )
    n_lora, n_frozen = trainable_param_count(params, mask)
    build_s = time.perf_counter() - t0

    n_audio_tok = audio_config.num_audio_tokens(int(AUDIO_SECS * audio_config.sample_rate))
    n_image_tok = vision_config.num_image_tokens()
    text_len = config.max_seq_len - n_audio_tok - n_image_tok
    assert text_len > 0, (n_audio_tok, n_image_tok)
    # fused CE chunks must divide the text rows: 4096 - 1500 - 272 = 2324 = 4 * 581
    config = config.replace(fused_ce_chunks=4)

    def loss_fn(p, mb):
        loss = omni_mod.forward(
            p, config, audio_config, vision_config, mb["audio"], mb["images"], mb["tokens"],
            labels=mb["labels"], prefix_lm=True,
        )
        return loss, jnp.sum(mb["labels"] != -100)

    tx = get_optimizer("AdamW", 1e-4)
    state = init_train_state(params, mask, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((1, 1, int(AUDIO_SECS * 16_000))).astype(np.float32) * 0.1),
        "images": jnp.asarray(rng.standard_normal((1, 1, 224, 224, 3)).astype(np.float32) * 0.5),
        "tokens": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, text_len)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(1, config.vocab_size, (1, 1, text_len)).astype(np.int32)),
    }

    # block_until_ready does not sync on the tunneled backend — fence with float()
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
    rec = {
        "metric": "mfu_8b_qlora_omni_prefix_lm",
        "value": round(mfu, 4),
        "unit": "MFU (useful-FLOPs / bf16 peak)",
        "vs_baseline": round(mfu / 0.45, 4),
        "tokens_per_sec_per_chip": round(config.max_seq_len / dt, 1),
        "audio_secs_per_second": round(AUDIO_SECS / dt, 2),
        "images_per_second": round(1.0 / dt, 2),
        "step_time_ms": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "build_s": round(build_s, 1),
        "loss": round(final_loss, 4),
        "first_loss": round(loss0, 4),
        "trainable_params": int(n_lora),
        "frozen_params": int(n_frozen),
        "seq_layout": {"audio_tokens": n_audio_tok, "image_tokens": n_image_tok, "text_tokens": text_len},
        "model": "Llama-3.1-8B geometry, int8 base (dynamic-act Pallas GEMM) + LoRA, "
        "30s audio + 224px image prefix-LM, flash_proj remat, fused CE, seq 4096, bf16",
    }
    out_dir = Path("runs/bench_omni")
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "omni_step.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
