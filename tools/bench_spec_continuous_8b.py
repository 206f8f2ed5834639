"""Speculative x continuous batching at the 8B single-chip serving geometry.

VERDICT r4 next-list #5: the composition (speculative rounds driven by the slot
scheduler) was proven only at toy scale (16L d=1024 trained pair: 1.356x,
runs/bench_speculative/continuous.json). No trained 8B pair exists in this offline
image, so this artifact brackets the composition at the REAL geometry (int8
weights, int8 KV cache, staggered traffic) with the two draft configurations that
need no training:

- self-draft CEILING: draft == target (acceptance pinned at gamma+1). vs_plain
  isolates the speculative-round machinery cost at 8B — a self-draft pays the
  target's full decode cost per drafted token, so vs_plain ~ (gamma+1) * T_chunk /
  T_round; what it proves is that rounds, per-row positions, KV double-cache and
  admission survive the 8B memory/latency envelope. Greedy self-draft output is
  asserted row-identical to plain-continuous greedy output (the exactness gate —
  models/speculative.py greedy verification never trusts the draft).
- cheap-draft FLOOR: an untrained 4L d=1024 draft whose proposals are uncorrelated
  with the target (acceptance ~1 token/pass). This is the worst case a user can
  hit; together with the measured round cost it anchors the analytic curve
  vs_plain(a) = a * T_plain_tok / T_round_tok that the 1B breakeven sweep
  (tools/bench_spec_breakeven.py) validates end to end.

usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_spec_continuous_8b.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--geometry", default="8b", choices=["tiny", "1b", "8b"])
    parser.add_argument("--gamma", type=int, default=4)
    parser.add_argument("--n_requests", type=int, default=6)
    parser.add_argument("--n_slots", type=int, default=4)
    parser.add_argument("--prompt_len", type=int, default=512)
    parser.add_argument("--max_tokens", type=int, default=256)
    parser.add_argument("--stagger_s", type=float, default=0.25)
    parser.add_argument("--chunk_rounds", type=int, default=4,
                        help="speculative rounds per dispatch; plain uses an "
                             "equal-token chunk of chunk_rounds*(gamma+1)")
    parser.add_argument("--out", default="runs/bench_speculative/continuous_8b.json")
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from llama_x_tpu.models import llama
    from llama_x_tpu.serve.continuous import ContinuousScheduler
    from llama_x_tpu.serve.speculative import SpeculativeScheduler
    from tools.bench_serve import GEOMETRIES, build_params

    if args.geometry == "tiny":  # CPU smoke for the tool itself
        config = llama.tiny_config(max_seq_len=512)
        params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
        d_config = config.replace(num_layers=1)
        d_params = llama.init(jax.random.PRNGKey(7), d_config, dtype=jnp.float32)
        kv = jnp.float32
        args.prompt_len, args.max_tokens = 48, 32
    else:
        config = llama.LlamaConfig(**GEOMETRIES[args.geometry], max_seq_len=4096)
        params = build_params(config, True, jax.random.PRNGKey(0))
        # floor draft: untrained 4L toy sharing vocab/rope with the target
        d_geo = dict(GEOMETRIES[args.geometry], num_layers=4, embed_dim=1024,
                     num_heads=8, num_kv_heads=8, intermediate_dim=2816)
        kv = jnp.int8 if args.geometry == "8b" else jnp.bfloat16
        d_config = llama.LlamaConfig(**d_geo, max_seq_len=4096)
        d_params = build_params(d_config, False, jax.random.PRNGKey(7))

    rng = np.random.default_rng(11)
    prompts = [[int(t) for t in rng.integers(1, config.vocab_size, args.prompt_len)]
               for _ in range(args.n_requests)]
    greedy = (0.0, 0, 1.0, 0.0)

    def drive(sched):
        """Warm, then submit the staggered arrival schedule; returns
        (tok/s, wall, rows-of-tokens, sorted ttfts)."""
        recs = []

        def submit(ids):
            rec = {"t0": time.perf_counter()}

            class _Q:
                def put(self, item):
                    if item is not None and "ttft" not in rec:
                        rec["ttft"] = time.perf_counter() - rec["t0"]

            rec["h"] = sched.submit(ids, max_tokens=args.max_tokens,
                                    sampling=greedy, stream_q=_Q())
            return rec

        w = sched.submit(prompts[0][: args.prompt_len], max_tokens=8, sampling=greedy)
        assert w.event.wait(1800) and w.error is None, w.error
        t0 = time.perf_counter()
        for p in prompts:
            recs.append(submit(p))
            time.sleep(args.stagger_s)
        for r in recs:
            assert r["h"].event.wait(1800) and r["h"].error is None, r["h"].error
        wall = time.perf_counter() - t0
        toks = sum(len(r["h"].tokens) for r in recs)
        ttfts = sorted(r["ttft"] for r in recs)
        return toks / wall, wall, [list(r["h"].tokens) for r in recs], ttfts

    res = {"geometry": args.geometry, "gamma": args.gamma,
           "n_requests": args.n_requests, "n_slots": args.n_slots,
           "prompt_len": args.prompt_len, "max_tokens": args.max_tokens,
           "stagger_s": args.stagger_s,
           "weights": "int8" if args.geometry != "tiny" else "f32",
           "kv_cache": {jnp.int8: "int8", jnp.bfloat16: "bf16"}.get(kv, "f32"),
           "traffic": "staggered arrivals, greedy"}

    plain = ContinuousScheduler(params, config, n_slots=args.n_slots,
                                chunk_size=args.chunk_rounds * (args.gamma + 1),
                                cache_dtype=kv)
    try:
        tok_s, wall, plain_rows, ttfts = drive(plain)
    finally:
        plain.close()
    res["plain"] = {"tok_s": round(tok_s, 1), "wall_s": round(wall, 2),
                    "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3)}
    print(json.dumps(res["plain"]), flush=True)

    for tag, dp, dc in (("spec_self_draft_ceiling", params, config),
                        ("spec_cheap_draft_floor", d_params, d_config)):
        sched = SpeculativeScheduler(params, config, dp, dc, gamma=args.gamma,
                                     n_slots=args.n_slots,
                                     chunk_size=args.chunk_rounds, cache_dtype=kv)
        try:
            tok_s, wall, rows, ttfts = drive(sched)
            rounds = sched.rounds_run
        finally:
            sched.close()
        row = {"tok_s": round(tok_s, 1), "wall_s": round(wall, 2),
               "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3),
               "vs_plain": round(tok_s / res["plain"]["tok_s"], 3),
               "draft": f"{dc.num_layers}L d={dc.embed_dim}", "rounds": rounds}
        if tag.startswith("spec_self"):
            match = all(a == b for a, b in zip(rows, plain_rows))
            assert match, "greedy self-draft speculative must equal plain greedy rows"
            row["greedy_rows_match_plain"] = match
        res[tag] = row
        print(json.dumps({tag: row}), flush=True)

    # analytic bridge, anchored by the two measurements: T_round from the floor
    # (acceptance-independent), plain per-token cost from the plain run
    floor = res["spec_cheap_draft_floor"]
    if floor["vs_plain"] > 0:
        res["est_vs_plain_at_acceptance"] = {
            f"{a:.1f}": round(a * floor["vs_plain"], 2) for a in (1.5, 2.0, 3.0, 4.0)
        }
        res["breakeven_tokens_per_pass_est"] = round(1.0 / floor["vs_plain"], 2)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
