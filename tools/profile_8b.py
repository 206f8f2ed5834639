"""XSpace trace of the headline 8B QLoRA step -> top-op table artifact.

VERDICT-r3 item 6: the MFU push needs evidence about where the non-MXU time goes.
This runs the EXACT bench.py 8B step (same build, same remat/int8 knobs) under
``jax.profiler.trace``, summarizes the device planes with the offline XSpace parser
(train/xprof.py — no tensorboard in this image), and writes the top-op table plus an
op-family bucketing to runs/profile_8b/top_ops.json.

If the tunneled backend returns no device planes (remote tracing is best-effort
through the relay), the artifact records that honestly instead of fabricating
attribution — the differential-ablation route (tools/ablate_8b.py) is the fallback
evidence path.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_8b.py
"""

from __future__ import annotations

import argparse
import collections
import json
import time
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3, help="traced steps (after warmup)")
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--trace_dir", default="runs/profile_8b/trace")
    parser.add_argument("--out", default="runs/profile_8b/top_ops.json")
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from llama_x_tpu.models import audio as audio_mod
    from llama_x_tpu.train.optim import get_optimizer
    from llama_x_tpu.train.trainer import init_train_state, make_train_step
    from llama_x_tpu.train.xprof import _bucket, device_op_times

    config, audio_config, params, mask = bench.build_8b_qlora()
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

    # warmup: compile + one steady-state step (sync via float(), CLAUDE.md)
    state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    float(metrics["loss"])
    step_ms = (time.perf_counter() - t0) * 1e3
    print(f"steady-state step: {step_ms:.1f} ms (wall, incl. tunnel sync)")

    trace_dir = Path(args.trace_dir)
    trace_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])

    planes = device_op_times(trace_dir)
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    if not planes:
        artifact = {
            "step_ms_wall": round(step_ms, 1),
            "traced_steps": args.steps,
            "device_planes": 0,
            "note": "remote backend returned no device planes through the relay; "
                    "per-op attribution falls back to tools/ablate_8b.py differential runs",
        }
        out_path.write_text(json.dumps(artifact, indent=1))
        print("no device planes in trace — wrote honest-negative artifact")
        print(f"wrote {out_path}")
        return

    # merge all device planes (single chip -> one plane)
    ops: dict[str, float] = collections.defaultdict(float)
    for plane_ops in planes.values():
        for name, t in plane_ops.items():
            ops[name] += t
    total = sum(ops.values())
    per_step = total / args.steps

    buckets = collections.defaultdict(float)
    for name, t in ops.items():
        buckets[_bucket(name)] += t

    top = sorted(ops.items(), key=lambda x: -x[1])[: args.top]
    print(f"== device total {total*1e3:.1f} ms over {args.steps} steps "
          f"({per_step*1e3:.1f} ms/step attributed)")
    for name, t in top:
        print(f"  {t/args.steps*1e3:9.2f} ms/step  {100*t/total:5.1f}%  {name[:90]}")
    print("== op families")
    for name, t in sorted(buckets.items(), key=lambda x: -x[1])[:12]:
        print(f"  {t/args.steps*1e3:9.2f} ms/step  {100*t/total:5.1f}%  {name}")

    artifact = {
        "step_ms_wall": round(step_ms, 1),
        "traced_steps": args.steps,
        "device_ms_per_step_attributed": round(per_step * 1e3, 2),
        "top_ops": [
            {"op": name[:120], "ms_per_step": round(t / args.steps * 1e3, 3),
             "pct": round(100 * t / total, 2)}
            for name, t in top
        ],
        "op_families": [
            {"family": name, "ms_per_step": round(t / args.steps * 1e3, 3),
             "pct": round(100 * t / total, 2)}
            for name, t in sorted(buckets.items(), key=lambda x: -x[1])[:12]
        ],
    }
    out_path.write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
