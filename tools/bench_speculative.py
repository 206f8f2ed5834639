"""Speculative-decoding machinery bench: overhead floor and full-acceptance ceiling.

With random weights a draft model's proposals are uncorrelated with the target
(acceptance ~ 1 emitted token per verify round), so tok/s here brackets the machinery
rather than predicting production speedup — that depends on draft quality, which
needs trained weights (see README's recipe):

- plain:       target-only greedy decode (the baseline every row compares to)
- spec_floor:  tiny uncorrelated draft — worst case, every round pays gamma draft
               steps + one verify pass and emits ~1 token
- spec_ceiling: target as its own draft — acceptance is exactly gamma+1 per round
               (the greedy verify reproduces the drafts, plus the bonus token at the
               verify pass's last position), validating the full-acceptance path at
               speed; NOT a speedup claim (a self-draft costs as much as the target)

Artifact: runs/bench_speculative/speculative.json.
usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_speculative.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate
from llama_x_tpu.models.speculative import generate_speculative

GEOM_1B = dict(embed_dim=2048, num_layers=16, head_dim=128, num_heads=16,
               num_kv_heads=8, intermediate_dim=5632, vocab_size=32_000)
GEOM_DRAFT = dict(embed_dim=512, num_layers=4, head_dim=64, num_heads=8,
                  num_kv_heads=4, intermediate_dim=1536, vocab_size=32_000)


def main():
    import argparse
    import json
    from pathlib import Path

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="runs/bench_speculative/speculative.json")
    parser.add_argument("--new_tokens", type=int, default=128)
    parser.add_argument("--gamma", type=int, default=4)
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    config = llama.LlamaConfig(**GEOM_1B, max_seq_len=2048)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    d_config = llama.LlamaConfig(**GEOM_DRAFT, max_seq_len=2048)
    d_params = llama.init(jax.random.PRNGKey(1), d_config, dtype=jnp.bfloat16)
    prompt = jnp.asarray(np.random.default_rng(0).integers(1, 32_000, (1, 512)), jnp.int32)
    n = args.new_tokens

    def timed(fn):
        jax.tree.map(np.asarray, fn())  # compile AND sync (block_until_ready does not
        t0 = time.perf_counter()        # sync on the tunneled backend — CLAUDE.md)
        out = fn()
        jax.tree.map(np.asarray, out)
        return out, time.perf_counter() - t0

    rows = {}
    _, dt = timed(lambda: generate(params, config, prompt, max_new_tokens=n))
    rows["plain"] = {"tok_s": round(n / dt, 1)}
    print(f"plain:        {n / dt:7.1f} tok/s", flush=True)

    for tag, dp, dc in (("spec_floor", d_params, d_config), ("spec_ceiling", params, config)):
        (out, stats), dt = timed(lambda dp=dp, dc=dc: generate_speculative(
            params, config, dp, dc, prompt, max_new_tokens=n, gamma=args.gamma))
        emitted = int(np.asarray(stats["tokens_emitted"]).sum())
        passes = int(stats["target_passes"])
        rows[tag] = {
            "tok_s": round(emitted / dt, 1),
            "target_passes": passes,
            "tokens_per_pass": round(emitted / passes, 2),
            "vs_plain": round((emitted / dt) / rows["plain"]["tok_s"], 3),
        }
        print(f"{tag}: {emitted / dt:7.1f} tok/s | {passes} target passes "
              f"({emitted / passes:.2f} tok/pass) | {rows[tag]['vs_plain']:.2f}x plain", flush=True)

    # batched floor: B rows decode speculatively at once (per-row acceptance); with
    # an uncorrelated draft every row advances ~1 token/round, so this measures the
    # batched machinery's overhead vs plain batched decode
    B = 8
    bprompt = jnp.asarray(np.random.default_rng(1).integers(1, 32_000, (B, 512)), jnp.int32)
    _, dt = timed(lambda: generate(params, config, bprompt, max_new_tokens=n))
    rows["plain_b8"] = {"tok_s": round(B * n / dt, 1)}
    (out, stats), dt = timed(lambda: generate_speculative(
        params, config, d_params, d_config, bprompt, max_new_tokens=n, gamma=args.gamma))
    emitted = int(np.asarray(stats["tokens_emitted"]).sum())
    rows["spec_floor_b8"] = {
        "tok_s": round(emitted / dt, 1),
        "target_passes": int(stats["target_passes"]),
        "vs_plain": round((emitted / dt) / rows["plain_b8"]["tok_s"], 3),
    }
    print(f"plain_b8:     {rows['plain_b8']['tok_s']:7.1f} tok/s | spec_floor_b8: "
          f"{rows['spec_floor_b8']['tok_s']:7.1f} tok/s ({rows['spec_floor_b8']['vs_plain']:.2f}x)", flush=True)

    # arithmetic, not a measurement: the floor row's round cost (gamma cheap-draft
    # steps + one verify pass) is acceptance-independent, so a trained draft whose
    # proposals all get accepted would emit gamma+1 tokens per round at that same cost
    mult = args.gamma + 1
    rows["cheap_draft_full_accept_est"] = {
        "tok_s": round(rows["spec_floor"]["tok_s"] * mult, 1),
        "vs_plain": round(rows["spec_floor"]["tok_s"] * mult / rows["plain"]["tok_s"], 2),
        "note": "computed = (gamma+1) x spec_floor (same round cost, gamma+1 tokens emitted)",
    }
    print(f"cheap-draft full-accept estimate: {rows['cheap_draft_full_accept_est']['tok_s']} tok/s "
          f"({rows['cheap_draft_full_accept_est']['vs_plain']}x plain)", flush=True)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(
        {"geometry": "1b target, 4-layer draft", "prefill": 512, "new_tokens": n,
         "gamma": args.gamma, "rows": rows}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
