"""Training-quality check for the int8 fused-CE head (ops/cross_entropy.py head_int8).

Same methodology as tools/int8_bwd_quality.py: train the identical synthetic
copy-permutation task twice — identical init, data order, optimizer — once with the
bf16 fused-CE vocab GEMMs and once with the int8 MXU path (rowwise-quantized hidden
chunks x colwise-quantized head; dH through the scale-folded NT GEMM). The ONLY
difference is the int8 rounding of h / K / dlogits, so any quality cost shows as
curve divergence. Composition mirrors the 8B bench: int8 frozen base + LoRA, frozen
LM head, chunked fused CE.

The XLA int8 fallback computes bit-identical quantization math to the Pallas kernels,
so this runs anywhere — CPU included.

Artifact: runs/int8_head_quality/quality.json
usage: JAX_PLATFORMS=cpu python tools/int8_head_quality.py
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def run(int8_head: bool, steps: int, seed: int = 0):
    from llama_x_tpu.adapters import apply_linear_adapter, quantize_linear, trainable_mask
    from llama_x_tpu.models import llama
    from llama_x_tpu.train.optim import get_optimizer, trapezoid_schedule
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    config = llama.LlamaConfig(
        embed_dim=128, num_layers=8, head_dim=32, num_heads=4, num_kv_heads=2,
        intermediate_dim=384, max_seq_len=128, vocab_size=512,
        dynamic_int8_act=True, dynamic_int8_bwd=True, attn_impl="xla",
        fused_ce_chunks=4, frozen_head=True, int8_head=int8_head,
    )
    params = llama.init(jax.random.PRNGKey(seed), config, dtype=jnp.float32)
    params = dict(params, layers=quantize_linear(params["layers"], "int8"))
    params = dict(params, layers=apply_linear_adapter(params["layers"], "lora", jax.random.PRNGKey(seed + 1)))
    mask = trainable_mask(params, freeze_prefixes=("tok_embeddings", "output", "norm"))

    tx = get_optimizer("AdamW", trapezoid_schedule(3e-3, steps, 0.1, 0.1), clip_grad_norm=1.0)
    state = init_train_state(params, mask, tx)

    def loss_fn(p, mb):
        loss = llama.forward(p, config, mb["tokens"], labels=mb["labels"])
        return loss, jnp.sum(mb["labels"] != -100)

    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(42)  # SAME data stream for both runs
    losses = []
    for _ in range(steps):
        first = rng.integers(1, 512, (1, 8, 1))
        toks = [first]
        for _ in range(64):
            toks.append((toks[-1] * 3 + 7) % 512)
        tokens = np.concatenate(toks, axis=-1).astype(np.int32)
        batch = {"tokens": tokens[..., :-1], "labels": tokens[..., 1:].astype(np.int32)}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--out", default="runs/int8_head_quality/quality.json")
    args = parser.parse_args()

    t0 = time.perf_counter()
    fp = run(False, args.steps)
    q = run(True, args.steps)
    tail = slice(-50, None)
    artifact = {
        "task": "next = (tok*3+7) % V copy-permutation, 8-layer QLoRA (int8 base + LoRA), frozen head",
        "steps": args.steps,
        "final_loss_bf16_head": round(float(np.mean(fp[tail])), 4),
        "final_loss_int8_head": round(float(np.mean(q[tail])), 4),
        "first_loss": round(fp[0], 4),
        "max_curve_gap": round(float(np.abs(np.asarray(fp) - np.asarray(q)).max()), 4),
        "curve_bf16": [round(x, 3) for x in fp[:: max(1, args.steps // 40)]],
        "curve_int8": [round(x, 3) for x in q[:: max(1, args.steps // 40)]],
        "wall_seconds": round(time.perf_counter() - t0, 1),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(artifact, indent=1))
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()
