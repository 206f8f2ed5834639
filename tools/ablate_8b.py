"""8B bench knob ablation: step time under remat-policy / CE-chunk variants.

Runs the exact bench.py 8B QLoRA prefix-LM step with one knob changed at a time and
prints a table — the evidence behind the defaults (remat_policy="flash_proj",
fused_ce_chunks=8). Variants that OOM are reported as such (that is the datum:
e.g. "dots_flash" does not fit 8B at S=4096 on 16 GB).

Measured (v5e, 2026-08-17, post GEMM retune):
    baseline (flash remat, ce_chunks=8)   1110.5 ms/step
    ce_chunks=4                           1108.3 ms/step   (tie, within noise)
    ce_chunks=16                          1134.7 ms/step   (+2%)
    remat=dots_flash                      FAIL (compile-time OOM: saving matmul
                                          outputs does not fit 8B S=4096 in 16 GB)

Re-measured with int8 dgrads (dynamic_int8_bwd, same day): same ordering —
    baseline 971.4 | ce_chunks=4 967.6 (tie) | ce_chunks=16 992.0 | dots_flash FAIL
    remat=flash_qkv 954.8 (saves q/k/v projection outputs, ~1.5 GB)
    remat=flash_proj 947.7 (qkv + wo + w2 outputs, ~3.5 GB; now the bench default —
    headline 946 ms / 71.1% MFU)

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/ablate_8b.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench


def step_time(config_overrides: dict, n_iters: int = 6) -> float:
    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step

    config, audio_config, params, mask = bench.build_8b_qlora()
    config = config.replace(**config_overrides)

    audio_secs = 40.0
    text_len = config.max_seq_len - audio_config.num_audio_tokens(int(audio_secs * 16_000))

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
    state, metrics = step(state, batch)
    float(metrics["loss"])  # compile + sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / n_iters


VARIANTS = [
    ("baseline (bench.REMAT default, ce_chunks=8)", {}),
    ("remat=flash", {"remat_policy": "flash"}),
    ("ce_chunks=4", {"fused_ce_chunks": 4}),
    ("ce_chunks=16", {"fused_ce_chunks": 16}),
    ("remat=dots_flash", {"remat_policy": "dots_flash"}),
    ("remat=flash_qkv", {"remat_policy": "flash_qkv"}),
    ("remat=flash_proj", {"remat_policy": "flash_proj"}),
    # int8-residual MLP (feed_forward_q8): backward never re-runs w1/w3; the three
    # variants trade attention-region saves against the +1.9 GB q1/q3 residuals
    ("remat=flash_q8", {"remat_policy": "flash_q8"}),
    ("remat=flash_qkv_q8", {"remat_policy": "flash_qkv_q8"}),
    ("remat=flash_proj_q8", {"remat_policy": "flash_proj_q8"}),
    # q8s = h1-only residual (h3 recomputed with one GEMM): half the q8 residual
    # memory — the full-q8 rows OOM at 8B/S=4096 (runtime HBM, surfaces as a remote
    # compile 500 — tools/repro_q8_compile.py), these are the 16 GB fit
    ("remat=flash_q8s", {"remat_policy": "flash_q8s"}),
    # qkv saves (+1.5 GB) on top of q8s: prunes the 3 qkv int8-GEMM backward
    # recomputes (~0.6 ms/layer) — the middle point between flash_q8s (fits) and
    # flash_proj_q8s (+3.5 GB, OOM)
    ("remat=flash_qkv_q8s", {"remat_policy": "flash_qkv_q8s"}),
    ("remat=flash_proj_q8s", {"remat_policy": "flash_proj_q8s"}),
]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="",
                    help="comma-separated substring filter on variant names (default: all)")
    args = ap.parse_args()
    wanted = [w for w in args.variants.split(",") if w]
    for name, overrides in VARIANTS:
        if wanted and not any(w in name for w in wanted):
            continue
        try:
            dt = step_time(overrides)
            print(f"{name:42s} {dt*1e3:8.1f} ms/step", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:80] if str(e) else type(e).__name__
            print(f"{name:42s} FAIL: {msg}", flush=True)


if __name__ == "__main__":
    main()
