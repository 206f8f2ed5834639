"""Speculative decoding with a TRAINED draft/target pair: the real-acceptance
demonstration (the machinery bench in bench_speculative.py uses random weights and
can only bracket overhead; this measures an actual end-to-end win).

Recipe (both trainers run offline on the learnable counting task, data/synthetic.py):

  # target: deep enough that decode is weight-bound
  python train_metamathqa.py --synthetic 2048 --synthetic_task count \
      --synthetic_config '{"num_layers":16,"embed_dim":1024,"head_dim":64,"num_heads":16,"num_kv_heads":8,"intermediate_dim":2816}' \
      --max_seq_len 512 --batch_size 16 --n_steps 600 --lr 3e-3 --run_name spec_target

  # draft: a fraction of the cost, same task
  python train_metamathqa.py --synthetic 2048 --synthetic_task count \
      --synthetic_config '{"num_layers":2,"embed_dim":256,"head_dim":32,"num_heads":8,"num_kv_heads":4,"intermediate_dim":512}' \
      --max_seq_len 512 --batch_size 16 --n_steps 600 --lr 3e-3 --run_name spec_draft

  python tools/bench_spec_trained.py --resume runs/metamathqa/spec_target_* \
      --draft_resume runs/metamathqa/spec_draft_* --gamma 4

Reports: held-out task accuracy for both models (the quality gate — acceptance on a
task neither model learned would be meaningless), plain-decode tok/s, speculative
tok/s, measured tokens/verify-pass, and vs_plain. Artifact:
runs/bench_speculative/trained_pair.json.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def load_run(resume: str):
    import jax
    import jax.numpy as jnp

    from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_params
    from llama_x_tpu.train.cli import load_model_configs

    run_dir = Path(resume)
    path = latest_checkpoint(run_dir) or run_dir
    config = load_model_configs(run_dir)[0]
    params, step = restore_params(path)
    params = jax.tree.map(jnp.asarray, params)
    for stem in ("audio_embed", "patch_embed"):
        params.pop(stem, None)
    print(f"loaded step-{step} params from {path} "
          f"({config.num_layers}L d={config.embed_dim})")
    return params, config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resume", required=True, help="trained target run dir")
    parser.add_argument("--draft_resume", required=True, help="trained draft run dir")
    parser.add_argument("--gamma", type=int, default=4)
    parser.add_argument("--new_tokens", type=int, default=256)
    parser.add_argument("--prompt_chars", type=int, default=24)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--min_accuracy", type=float, default=0.9,
                        help="held-out target accuracy gate (else the numbers are noise)")
    parser.add_argument("--out", default="runs/bench_speculative/trained_pair.json")
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from llama_x_tpu.data.synthetic import counting_accuracy, counting_prompt
    from llama_x_tpu.data.tokenizers import get_tokenizer
    from llama_x_tpu.models.generate import generate
    from llama_x_tpu.models.speculative import generate_speculative

    params, config = load_run(args.resume)
    d_params, d_config = load_run(args.draft_resume)
    tok = get_tokenizer("byte", None)

    rng = np.random.default_rng(123)  # held-out starts (training used seed 0)
    prompts = [counting_prompt(rng, args.prompt_chars) for _ in range(args.batch)]
    rows = [tok(p, add_bos=True) for p in prompts]
    P = max(len(r) for r in rows)
    padded = np.full((args.batch, P), tok.pad_id, np.int32)
    for i, r in enumerate(rows):
        padded[i, : len(r)] = r
    lens = jnp.asarray([len(r) for r in rows], jnp.int32) if args.batch > 1 else None
    prompt = jnp.asarray(padded)
    n = args.new_tokens

    def decode_rows(out):
        return [tok.decode([int(t) for t in row if t not in (tok.pad_id, tok.eos_id)])
                for row in np.asarray(out)]

    def timed(fn):
        jax.tree.map(np.asarray, fn())  # compile AND sync (block_until_ready does not
        t0 = time.perf_counter()        # sync on the tunneled backend — CLAUDE.md)
        out = fn()
        jax.tree.map(np.asarray, out)
        return out, time.perf_counter() - t0

    # ---- quality gate: both models must have learned the held-out continuation ----
    plain_out, dt_plain = timed(lambda: generate(
        params, config, prompt, max_new_tokens=n, prompt_lens=lens))
    t_acc = float(np.mean([counting_accuracy(p, c) for p, c in zip(prompts, decode_rows(plain_out))]))
    draft_out, _ = timed(lambda: generate(
        d_params, d_config, prompt, max_new_tokens=n, prompt_lens=lens))
    d_acc = float(np.mean([counting_accuracy(p, c) for p, c in zip(prompts, decode_rows(draft_out))]))
    print(f"held-out accuracy: target {t_acc:.3f}, draft {d_acc:.3f}")
    assert t_acc >= args.min_accuracy, (
        f"target accuracy {t_acc:.3f} < {args.min_accuracy} — train it longer first"
    )

    plain_tok_s = args.batch * n / dt_plain
    print(f"plain:       {plain_tok_s:8.1f} tok/s ({dt_plain * 1e3:.0f} ms)")

    (spec_out, stats), dt_spec = timed(lambda: generate_speculative(
        params, config, d_params, d_config, prompt,
        max_new_tokens=n, gamma=args.gamma, prompt_lens=lens))
    emitted = int(np.asarray(stats["tokens_emitted"]).sum())
    passes = int(stats["target_passes"])
    spec_tok_s = emitted / dt_spec
    acc_per_pass = emitted / args.batch / passes
    match = bool((np.asarray(spec_out) == np.asarray(plain_out)).all())
    print(f"speculative: {spec_tok_s:8.1f} tok/s ({dt_spec * 1e3:.0f} ms) | "
          f"{passes} passes, {acc_per_pass:.2f} tok/pass | "
          f"{spec_tok_s / plain_tok_s:.2f}x plain | greedy-match={match}")

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({
        "task": "count (data/synthetic.py), held-out starts",
        "target": f"{config.num_layers}L d={config.embed_dim}",
        "draft": f"{d_config.num_layers}L d={d_config.embed_dim}",
        "batch": args.batch, "new_tokens": n, "gamma": args.gamma,
        "target_heldout_accuracy": round(t_acc, 4),
        "draft_heldout_accuracy": round(d_acc, 4),
        "plain_tok_s": round(plain_tok_s, 1),
        "spec_tok_s": round(spec_tok_s, 1),
        "tokens_per_pass": round(acc_per_pass, 2),
        "vs_plain": round(spec_tok_s / plain_tok_s, 3),
        "greedy_trajectories_match": match,
    }, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
