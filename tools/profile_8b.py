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
    parser.add_argument("--reuse_trace", action="store_true",
                        help="summarize an existing trace_dir offline (no device run)")
    parser.add_argument("--wall_ms", type=float, default=None,
                        help="with --reuse_trace: record the wall step time measured when "
                             "the trace was captured")
    args = parser.parse_args()

    from llama_x_tpu.train.xprof import _bucket, device_summary, op_details, roofline

    if args.reuse_trace:
        _summarize(args, step_ms=args.wall_ms, _bucket=_bucket,
                   device_summary=device_summary, op_details=op_details,
                   roofline=roofline)
        return

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

    _summarize(args, step_ms=step_ms, _bucket=_bucket,
               device_summary=device_summary, op_details=op_details,
               roofline=roofline)


def _summarize(args, step_ms, _bucket, device_summary, op_details, roofline):
    planes = device_summary(Path(args.trace_dir))
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    if not planes:
        artifact = {
            "step_ms_wall": round(step_ms, 1) if step_ms is not None else None,
            "traced_steps": args.steps,
            "device_planes": 0,
            "note": "remote backend returned no device planes through the relay; "
                    "per-op attribution falls back to tools/ablate_8b.py differential runs",
        }
        out_path.write_text(json.dumps(artifact, indent=1))
        print("no device planes in trace — wrote honest-negative artifact")
        print(f"wrote {out_path}")
        return

    # merge all device planes (single chip -> one plane); ops are SELF time
    # (nesting collapsed), async is overlapped DMA and NOT additive with ops
    ops: dict[str, float] = collections.defaultdict(float)
    async_ops: dict[str, float] = collections.defaultdict(float)
    busy_s = 0.0
    n_step_events = 0
    for plane in planes.values():
        for name, t in plane["ops"].items():
            ops[name] += t
        for name, t in plane["async"].items():
            async_ops[name] += t
        busy_s += plane["busy_s"]
        n_step_events += plane["steps"]
    total = sum(ops.values())
    # normalize by the STEP EVENTS the trace actually contains, not the loop count
    # the caller asked for — the profiler context regularly captures surrounding
    # dispatches (warmup replay etc.), which silently inflated "per-step" numbers
    # by the extra-steps factor when divided by args.steps
    n_steps = max(n_step_events, 1) if n_step_events else max(args.steps, 1)
    per_step = total / n_steps
    busy_per_step = busy_s / n_steps

    buckets = collections.defaultdict(float)
    for name, t in ops.items():
        buckets[_bucket(name)] += t
    async_buckets = collections.defaultdict(float)
    for name, t in async_ops.items():
        async_buckets[_bucket(name)] += t

    # HLO metadata join: category / flops / bytes / model source line per op
    details = op_details(Path(args.trace_dir))

    top = sorted(ops.items(), key=lambda x: -x[1])[: args.top]
    print(f"== device busy {busy_per_step*1e3:.1f} ms/step ({n_step_events} step events); "
          f"op self-time {per_step*1e3:.1f} ms/step attributed")
    for name, t in top:
        d = details.get(name, {})
        extra = (f" [{d.get('category','')}, {d.get('achieved_tflops', 0)} TF/s, "
                 f"{d.get('achieved_gbps', 0)} GB/s, {d.get('source','').split('/')[-1]}]"
                 if d else "")
        print(f"  {t/n_steps*1e3:9.2f} ms/step  {100*t/total:5.1f}%  {name[:60]}{extra}")

    # by model source line (where remat scopes blur op names, the source survives)
    by_source = collections.defaultdict(float)
    for name, d in details.items():
        by_source[d.get("source") or "?"] += d["self_s"]
    print("== by source line (self time)")
    src_total = sum(by_source.values())
    top_sources = sorted(by_source.items(), key=lambda x: -x[1])[:14]
    for src, t in top_sources:
        print(f"  {t/n_steps*1e3:9.2f} ms/step  {100*t/max(src_total,1e-12):5.1f}%  {src[-80:]}")
    print("== op families (self time)")
    for name, t in sorted(buckets.items(), key=lambda x: -x[1])[:14]:
        print(f"  {t/n_steps*1e3:9.2f} ms/step  {100*t/total:5.1f}%  {name}")
    print("== async families (overlapped with the above, not additive)")
    for name, t in sorted(async_buckets.items(), key=lambda x: -x[1])[:6]:
        print(f"  {t/n_steps*1e3:9.2f} ms/step  {name}")

    artifact = {
        "step_ms_wall": round(step_ms, 1) if step_ms is not None else None,
        "traced_steps": args.steps,
        "trace_step_events": n_step_events,
        "device_busy_ms_per_step": round(busy_per_step * 1e3, 2),
        "op_self_ms_per_step_attributed": round(per_step * 1e3, 2),
        "top_ops": [
            {"op": name[:120], "ms_per_step": round(t / n_steps * 1e3, 3),
             "pct": round(100 * t / total, 2),
             **({"category": details[name].get("category", ""),
                 "achieved_tflops": details[name].get("achieved_tflops", 0),
                 "achieved_gbps": details[name].get("achieved_gbps", 0),
                 "source": details[name].get("source", "")}
                if name in details else {})}
            for name, t in top
        ],
        "by_source": [
            {"source": src, "ms_per_step": round(t / n_steps * 1e3, 3)}
            for src, t in top_sources
        ],
        "op_families": [
            {"family": name, "ms_per_step": round(t / n_steps * 1e3, 3),
             "pct": round(100 * t / total, 2)}
            for name, t in sorted(buckets.items(), key=lambda x: -x[1])[:14]
        ],
        "async_families_overlapped": [
            {"family": name, "ms_per_step": round(t / n_steps * 1e3, 3)}
            for name, t in sorted(async_buckets.items(), key=lambda x: -x[1])[:6]
        ],
    }
    rl = roofline(details, steps=n_steps)
    artifact["roofline"] = {
        "available_ms_per_step": rl["available_ms"],
        "sol_speedup_ceiling": rl["sol_speedup"],
        "worst_offenders": rl["ops"][:10],
    }
    print(f"== roofline: {rl['available_ms']:.1f} ms/step above per-op speed-of-light "
          f"({rl['sol_speedup']}x ceiling on this op mix)")
    out_path.write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
