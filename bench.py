"""Headline benchmark: audio+text early-fusion prefix-LM training throughput on one TPU
chip (BASELINE.json north-star metric: audio+text tokens/sec/chip + MFU).

Runs the full production path — mel frontend + conv stem inside the jitted step,
Llama trunk with remat, LoRA adapters, fused chunked CE — on a ~1B-class config sized
for a single v5e (16 GB), 40 s audio windows (2000 audio tokens) + text to seq 4096.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline = MFU / 0.45 (the BASELINE.md target: ≥45% MFU ⇒ ≥1.0; the reference
publishes no numbers of its own, BASELINE.md:3-5).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak bf16 matmul throughput per chip
PEAK_FLOPS = 197e12


def model_flops_per_token(config) -> float:
    """Approximate train-step FLOPs/token: 6*P_matmul (fwd+bwd) + attention term.

    P counts matmul-visible params (projections + embeddings-out head); attention adds
    12*L*S*D_head_total per token for S-length causal (factor ~0.5 causal discount
    folded in).
    """
    D, L, F, V = config.embed_dim, config.num_layers, config.intermediate_dim, config.vocab_size
    H, hd, Hkv = config.num_heads, config.head_dim, config.num_kv_heads
    p_attn = D * (H * hd) * 2 + D * (Hkv * hd) * 2  # wq, wo, wk, wv
    p_mlp = 3 * D * F
    p_head = D * V
    p = L * (p_attn + p_mlp) + p_head
    flops = 6.0 * p
    # attention scores+values: 2 matmuls * 2 (fwd) * 3 (fwd+bwd) * S * (H*hd) * 0.5 causal
    S = config.max_seq_len
    flops += L * 12 * S * H * hd * 0.5
    return flops


def main():
    from llama_x_tpu.adapters import apply_linear_adapter, trainable_mask
    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.models import llama
    from llama_x_tpu.models.audio import AudioConfig, LlamaAudio
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    config = llama.LlamaConfig(
        embed_dim=2048,
        num_layers=16,
        head_dim=128,
        num_heads=16,
        num_kv_heads=8,
        intermediate_dim=5632,
        max_seq_len=4096,
        vocab_size=32_000,
        activation_checkpointing=True,
        remat_policy="dots_flash",
        fused_ce_chunks=8,
        attn_impl="auto",
    )
    audio_config = AudioConfig()
    audio_secs = 40.0
    n_audio_tok = audio_config.num_audio_tokens(int(audio_secs * audio_config.sample_rate))
    text_len = config.max_seq_len - n_audio_tok  # 2096

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

    # warmup/compile. NOTE: jax.block_until_ready does not actually sync on the
    # tunneled TPU backend — force a device->host transfer (float()) instead; each
    # iteration consumes the previous state so the final transfer fences the chain.
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

    tokens_per_step = config.max_seq_len  # audio + text tokens through the trunk
    toks_per_sec = tokens_per_step / dt
    mfu = model_flops_per_token(config) * tokens_per_step / dt / PEAK_FLOPS
    audio_secs_per_sec = audio_secs / dt

    print(
        json.dumps(
            {
                "metric": "audio_text_tokens_per_sec_per_chip",
                "value": round(toks_per_sec, 1),
                "unit": "tokens/s",
                "vs_baseline": round(mfu / 0.45, 4),
                "mfu": round(mfu, 4),
                "step_time_ms": round(dt * 1e3, 2),
                "audio_secs_per_second": round(audio_secs_per_sec, 2),
                "compile_s": round(compile_s, 1),
                "loss": round(float(metrics["loss"]), 4),
                "model": "1.1B llama-style, 40s audio prefix-LM, LoRA+remat+fused-CE, bf16",
            }
        )
    )


if __name__ == "__main__":
    main()
