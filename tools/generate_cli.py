"""Text generation CLI: load a model (HF checkpoint dir or a training-run dir) and
sample completions — the serving surface the reference never built (SURVEY.md §3
"there is no generate()/sampling loop anywhere — the new framework must design its
own"; models/generate.py is that design: one compiled prefill + lax.scan decode).

Model sources (mutually exclusive):
  --model  <hf dir / hub id>  — Llama.from_hf (streaming bf16 import, models/hf.py)
  --resume <run dir>          — a train_*.py run: params restored through the
                                production checkpoint path, architecture rebuilt from
                                model_config.json. int8 / LoRA / DoRA leaves restore
                                as-is — apply_linear consumes them natively, so a
                                QLoRA fine-tune serves without an export step.

usage:
  python tools/generate_cli.py --model /data/llama31-8b --tokenizer llama3 \
      --tokenizer_path /data/llama31-8b/original/tokenizer.model \
      --prompt "The capital of France is" --max_new_tokens 64 --temperature 0.7 --top_p 0.9
  python tools/generate_cli.py --resume runs/metamathqa/<run> --tokenizer byte \
      --prompt "2+2=" --max_new_tokens 32
  echo "prompt per line" | python tools/generate_cli.py --resume runs/... --stdin
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="HF checkpoint dir or hub id")
    src.add_argument("--resume", help="training run dir (or step_NNNNNNNN inside one)")
    parser.add_argument("--tokenizer", default="llama3", choices=["llama2", "llama3", "byte"])
    parser.add_argument("--tokenizer_path")
    parser.add_argument("--prompt", action="append", default=[], help="repeatable")
    parser.add_argument("--stdin", action="store_true", help="read one prompt per stdin line")
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.0, help="0 = greedy")
    parser.add_argument("--top_k", type=int, default=0)
    parser.add_argument("--top_p", type=float, default=1.0)
    parser.add_argument("--min_p", type=float, default=0.0,
                        help="drop tokens with prob < min_p * top-token prob")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_seq_len", type=int, default=0,
                        help="cap the KV cache (0: model config; smaller = less HBM)")
    parser.add_argument("--no_eos", action="store_true", help="ignore eos, always emit max_new_tokens")
    parser.add_argument("--kv_dtype", default="bf16", choices=["bf16", "int8"],
                        help="KV cache dtype: int8 halves cache HBM traffic + residency on the "
                             "single-token decode path; combined with --draft_model the "
                             "multi-query verify steps dequantize via XLA (no kernel win)")
    parser.add_argument("--batch", action="store_true",
                        help="generate all prompts in ONE ragged batch (single prefill; "
                             "per-row lengths) instead of sequentially — not with --draft_*")
    parser.add_argument("--template", choices=["alpaca"],
                        help="wrap each prompt in the training prompt template "
                             "(alpaca = the MetaMathQA SFT format, data/metamathqa.py)")
    parser.add_argument("--draft_model", help="HF dir of a draft model: speculative decoding (greedy or sampled)")
    parser.add_argument("--draft_resume", help="training run dir of a draft model")
    parser.add_argument("--gamma", type=int, default=4, help="speculative draft length per round")
    parser.add_argument("--stream", action="store_true",
                        help="print tokens as they decode (chunked resumable decode with "
                        "early exit; not combinable with --batch/--draft)")
    args = parser.parse_args()
    assert not (args.stream and (args.batch or args.draft_model or args.draft_resume)), (
        "--stream is plain per-prompt decoding (not combinable with --batch or a draft)"
    )

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_x_tpu.data.tokenizers import get_tokenizer
    from llama_x_tpu.models import llama
    from llama_x_tpu.models.generate import generate

    prompts = list(args.prompt)
    if args.stdin:
        prompts += [line.rstrip("\n") for line in sys.stdin if line.strip()]
    if not prompts:
        parser.error("no prompts: pass --prompt (repeatable) or --stdin")

    tok = get_tokenizer(args.tokenizer, args.tokenizer_path)

    def load(hf_dir: str | None, resume_dir: str | None):
        if resume_dir:
            from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_params
            from llama_x_tpu.train.cli import load_model_configs

            run_dir = Path(resume_dir)
            path = latest_checkpoint(run_dir) or run_dir
            saved = load_model_configs(run_dir) or load_model_configs(run_dir.parent)
            assert saved is not None, f"no model_config.json found near {run_dir}"
            config = saved[0]
            params, step = restore_params(path)
            params = jax.tree.map(jnp.asarray, params)
            for stem in ("audio_embed", "patch_embed"):  # text CLI: modality stems unused
                params.pop(stem, None)
            print(f"restored step-{step} params from {path}", file=sys.stderr)
        else:
            model = llama.Llama.from_hf(hf_dir, dtype=jnp.bfloat16)
            params, config = model.params, model.config
        if args.max_seq_len:
            config = config.replace(max_seq_len=args.max_seq_len)
        return params, config

    params, config = load(args.model, args.resume)
    draft = None
    if args.draft_model or args.draft_resume:
        draft = load(args.draft_model, args.draft_resume)
        from llama_x_tpu.models.speculative import generate_speculative

    if args.template == "alpaca":
        from llama_x_tpu.data.metamathqa import PROMPT_TEMPLATE

        prompts = [PROMPT_TEMPLATE.format(query=p) for p in prompts]

    key = jax.random.PRNGKey(args.seed)
    if args.batch:
        assert draft is None, "--batch is for the plain path (speculative batches internally)"
        ids_rows = [tok(p, add_bos=True) for p in prompts]
        P = max(len(r) for r in ids_rows)
        n_new = min(args.max_new_tokens, config.max_seq_len - P)
        assert n_new > 0, f"longest prompt ({P} tokens) fills the {config.max_seq_len} cache"
        padded = np.full((len(ids_rows), P), tok.pad_id, np.int32)
        for i, r in enumerate(ids_rows):
            padded[i, : len(r)] = r
        lens = jnp.asarray([len(r) for r in ids_rows], jnp.int32)
        eos_id = -1 if args.no_eos else tok.eos_id
        t0 = time.perf_counter()
        out = generate(
            params, config, jnp.asarray(padded), max_new_tokens=n_new, key=key,
            temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
            min_p=args.min_p, eos_id=eos_id, pad_id=tok.pad_id, prompt_lens=lens,
            cache_dtype=jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16,
        )
        rows = np.asarray(out)
        dt = time.perf_counter() - t0
        total = sum(int((row != tok.pad_id).sum()) for row in rows)
        print(f"--- {len(prompts)} prompts in one ragged batch: {total} tokens "
              f"({total / dt:.1f} tok/s incl. prefill + compile) ---", file=sys.stderr)
        for prompt, row in zip(prompts, rows):
            toks = [int(t) for t in row if t not in (tok.pad_id, tok.eos_id)]
            print(prompt + tok.decode(toks))
        return

    for i, prompt in enumerate(prompts):
        ids = tok(prompt, add_bos=True)
        budget = config.max_seq_len - len(ids)
        assert budget > 0, f"prompt ({len(ids)} tokens) fills the whole {config.max_seq_len} cache"
        n_new = min(args.max_new_tokens, budget)
        key, sub = jax.random.split(key)
        eos_id = -1 if args.no_eos else tok.eos_id
        t0 = time.perf_counter()
        cache_dtype = jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16
        if draft is not None:
            n_new = min(n_new,
                        config.max_seq_len - len(ids) - args.gamma - 1,
                        draft[1].max_seq_len - len(ids) - args.gamma)
            assert n_new > 0, (
                f"prompt ({len(ids)} tokens) + speculative reserve (gamma+1 = "
                f"{args.gamma + 1}) exceeds the target ({config.max_seq_len}) or "
                f"draft ({draft[1].max_seq_len}) cache"
            )
            out, stats = generate_speculative(
                params, config, draft[0], draft[1], jnp.asarray([ids], jnp.int32),
                max_new_tokens=n_new, gamma=args.gamma, key=sub,
                temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
                min_p=args.min_p, eos_id=eos_id, pad_id=tok.pad_id, cache_dtype=cache_dtype,
            )
        elif args.stream:
            from llama_x_tpu.models.generate import generate_stream

            print(prompt, end="", flush=True)
            toks, text = [], ""
            for block in generate_stream(
                params, config, jnp.asarray([ids], jnp.int32),
                max_new_tokens=n_new, key=sub,
                temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
                min_p=args.min_p, eos_id=eos_id, pad_id=tok.pad_id, cache_dtype=cache_dtype,
            ):
                toks += [int(t) for t in np.asarray(block)[0] if t not in (tok.pad_id, tok.eos_id)]
                full = tok.decode(toks)
                print(full[len(text):], end="", flush=True)
                text = full
            print(flush=True)
            out = None
        else:
            out = generate(
                params, config, jnp.asarray([ids], jnp.int32),
                max_new_tokens=n_new, key=sub,
                temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
                min_p=args.min_p, eos_id=eos_id, pad_id=tok.pad_id, cache_dtype=cache_dtype,
            )
        if out is None:  # --stream already printed incrementally
            row = toks
        else:
            row = [int(t) for t in np.asarray(out)[0] if t not in (tok.pad_id, tok.eos_id)]
        dt = time.perf_counter() - t0
        spec = f", {int(stats['target_passes'])} target passes" if draft is not None else ""
        print(f"--- prompt {i}: {len(ids)} tok prompt + {len(row)} tok completion "
              f"({len(row) / dt:.1f} tok/s incl. prefill{' + compile' if i == 0 else ''}{spec}) ---",
              file=sys.stderr)
        if out is not None:  # --stream already printed incrementally
            print(prompt + tok.decode(row))


if __name__ == "__main__":
    main()
