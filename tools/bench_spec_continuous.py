"""Speculative CONTINUOUS batching with a trained draft/target pair: the serving-
shaped form of tools/bench_spec_trained.py (which measures one fused batch).

Drives N counting-task requests through SpeculativeScheduler and through the plain
ContinuousScheduler with the same slot geometry, and reports aggregate generated
tok/s plus per-request held-out accuracy (the quality gate — acceptance on an
unlearned task would be noise). Requests are submitted all at once (saturated
slots) — the TTFT/staggered-traffic story is tools/bench_serve.py's job; this
artifact isolates the speculative round's steady-state throughput win under slot
scheduling, admission, and per-row positions.

usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_spec_continuous.py \
      --resume runs/metamathqa/spec_target4_* --draft_resume runs/metamathqa/spec_draft4_*
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", required=True, help="trained target run dir")
    parser.add_argument("--draft_resume", required=True, help="trained draft run dir")
    parser.add_argument("--gamma", type=int, default=4)
    parser.add_argument("--n_requests", type=int, default=8)
    parser.add_argument("--n_slots", type=int, default=4)
    parser.add_argument("--max_tokens", type=int, default=128)
    parser.add_argument("--prompt_chars", type=int, default=24)
    parser.add_argument("--chunk_size", type=int, default=16,
                        help="plain scheduler decode-chunk width (spec rounds emit "
                             "up to gamma+1 per round; chunk=rounds is its analogue)")
    parser.add_argument("--min_accuracy", type=float, default=0.9)
    parser.add_argument("--out", default="runs/bench_speculative/continuous.json")
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax.numpy as jnp

    from llama_x_tpu.data.synthetic import counting_accuracy, counting_prompt
    from llama_x_tpu.data.tokenizers import get_tokenizer
    from llama_x_tpu.serve.continuous import ContinuousScheduler
    from llama_x_tpu.serve.speculative import SpeculativeScheduler
    from tools.bench_spec_trained import load_run

    params, config = load_run(args.resume)
    d_params, d_config = load_run(args.draft_resume)
    tok = get_tokenizer("byte", None)

    rng = np.random.default_rng(321)  # held-out starts (training used seed 0)
    prompts = [counting_prompt(rng, args.prompt_chars) for _ in range(args.n_requests)]
    rows_ids = [[int(t) for t in tok(p, add_bos=True)] for p in prompts]

    def drive(sched):
        # warm the compiled programs with one request, then measure a full load
        warm = sched.submit(rows_ids[0], max_tokens=8)
        assert warm.event.wait(timeout=1200) and warm.error is None
        t0 = time.perf_counter()
        handles = [sched.submit(ids, max_tokens=args.max_tokens) for ids in rows_ids]
        for h in handles:
            assert h.event.wait(timeout=1200) and h.error is None, h.error
        dt = time.perf_counter() - t0
        emitted = sum(len(h.tokens) for h in handles)
        texts = [
            tok.decode([t for t in h.tokens if t not in (tok.pad_id, tok.eos_id)])
            for h in handles
        ]
        acc = float(np.mean([counting_accuracy(p, c) for p, c in zip(prompts, texts)]))
        return emitted / dt, acc, dt

    spec = SpeculativeScheduler(
        params, config, d_params, d_config, gamma=args.gamma,
        n_slots=args.n_slots, prompt_multiple=32,
    )
    try:
        spec_tok_s, spec_acc, spec_dt = drive(spec)
        rounds = spec.rounds_run
    finally:
        spec.close()
    print(f"speculative-continuous: {spec_tok_s:8.1f} tok/s (acc {spec_acc:.3f}, "
          f"{spec_dt*1e3:.0f} ms, {rounds} rounds)")

    plain = ContinuousScheduler(
        params, config, n_slots=args.n_slots, chunk_size=args.chunk_size,
        prompt_multiple=32,
    )
    try:
        plain_tok_s, plain_acc, plain_dt = drive(plain)
    finally:
        plain.close()
    print(f"plain-continuous:       {plain_tok_s:8.1f} tok/s (acc {plain_acc:.3f}, "
          f"{plain_dt*1e3:.0f} ms)")

    assert plain_acc >= args.min_accuracy, f"target accuracy {plain_acc:.3f} — train longer"
    vs = spec_tok_s / plain_tok_s
    print(f"vs_plain: {vs:.2f}x")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "task": "count (data/synthetic.py), held-out starts, saturated slots",
        "target": f"{config.num_layers}L d={config.embed_dim}",
        "draft": f"{d_config.num_layers}L d={d_config.embed_dim}",
        "n_requests": args.n_requests, "n_slots": args.n_slots,
        "max_tokens": args.max_tokens, "gamma": args.gamma,
        "spec_tok_s": round(spec_tok_s, 1),
        "plain_tok_s": round(plain_tok_s, 1),
        "vs_plain": round(vs, 3),
        "spec_heldout_accuracy": round(spec_acc, 4),
        "plain_heldout_accuracy": round(plain_acc, 4),
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
