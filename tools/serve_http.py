"""Minimal HTTP serving front-end: OpenAI-style /v1/completions over generate().

One process, one model, stdlib http.server — the deployment shape is "a chip behind
an endpoint", and everything heavy (batching, sampling, speculative, int8 weights /
int8 KV cache) already lives in the compiled generate() path:

- `prompt` may be a string or a list of strings: a list runs as ONE ragged batch
  (single prefill, per-row lengths — models/generate.py prompt_lens).
- `temperature` / `top_k` / `top_p` / `min_p` / `max_tokens` map onto sample_logits;
  `n` returns n independent samples per prompt (replicated rows in the same batch);
  `stop` (string or list) truncates each completion at the first stop sequence
  (host-side text trim after the compiled generate).
- int8 weights serve directly from a QLoRA run dir (--resume), int8 KV cache via
  --kv_dtype int8 — same flags as tools/generate_cli.py.
- requests are served under a model lock (one TPU program at a time); shape-identical
  requests reuse the compiled executable, so steady-state latency is device-bound.
  max_tokens is rounded UP to --tokens_multiple (default 32) before compilation and
  the output truncated, so arbitrary max_tokens values hit a handful of cached
  executables instead of compiling per request.

The reference has no serving surface at all (SURVEY.md §3); this is the thin
production wrapper over the framework's decode stack.

usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/serve_http.py \
      --resume runs/metamathqa/<run> --tokenizer byte --port 8000
  curl -s localhost:8000/v1/completions -d '{"prompt": "2+2=", "max_tokens": 16}'
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def next_multiple(x: int, n: int) -> int:
    return (x + n - 1) // n * n


class Engine:
    """Model + tokenizer + the compiled-path call. One lock: one device program."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from llama_x_tpu.data.tokenizers import get_tokenizer

        self.args = args
        self.jnp = jnp
        self.jax = jax
        self.tok = get_tokenizer(args.tokenizer, args.tokenizer_path)
        self.params, self.config = self._load(args)
        self.cache_dtype = jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16
        self.lock = threading.Lock()
        self.seed = args.seed

    @staticmethod
    def _load(args):
        from pathlib import Path

        import jax
        import jax.numpy as jnp

        from llama_x_tpu.models import llama

        if args.resume:
            from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_params
            from llama_x_tpu.train.cli import load_model_configs

            run_dir = Path(args.resume)
            path = latest_checkpoint(run_dir) or run_dir
            saved = load_model_configs(run_dir) or load_model_configs(run_dir.parent)
            assert saved is not None, f"no model_config.json found near {run_dir}"
            config = saved[0]
            params, step = restore_params(path)
            params = jax.tree.map(jnp.asarray, params)
            for stem in ("audio_embed", "patch_embed"):
                params.pop(stem, None)
            print(f"serving step-{step} params from {path}", file=sys.stderr)
        else:
            model = llama.Llama.from_hf(args.model, dtype=jnp.bfloat16)
            params, config = model.params, model.config
        if args.max_seq_len:
            config = config.replace(max_seq_len=args.max_seq_len)
        return params, config

    def complete(self, prompts: list[str], max_tokens: int, temperature: float,
                 top_k: int, top_p: float, min_p: float = 0.0):
        import numpy as np

        from llama_x_tpu.models.generate import generate

        jnp = self.jnp
        rows = [self.tok(p, add_bos=True) for p in prompts]
        P = max(len(r) for r in rows)
        budget = self.config.max_seq_len - P
        if budget <= 0:
            raise ValueError(f"longest prompt ({P} tokens) fills the {self.config.max_seq_len} cache")
        # round the compiled length up to a multiple so arbitrary max_tokens values
        # share executables; truncate the result back down
        n_new = min(next_multiple(max_tokens, self.args.tokens_multiple), budget)
        padded = np.full((len(rows), P), self.tok.pad_id, np.int32)
        for i, r in enumerate(rows):
            padded[i, : len(r)] = r
        lens = jnp.asarray([len(r) for r in rows], jnp.int32)

        with self.lock:
            self.seed += 1
            out = generate(
                self.params, self.config, jnp.asarray(padded), max_new_tokens=n_new,
                key=self.jax.random.PRNGKey(self.seed), temperature=temperature,
                top_k=top_k, top_p=top_p, min_p=min_p,
                eos_id=self.tok.eos_id, pad_id=self.tok.pad_id,
                prompt_lens=lens if len(rows) > 1 else None,
                cache_dtype=self.cache_dtype,
            )
            out = np.asarray(out)[:, :max_tokens]
        texts, counts = [], []
        for row in out:
            toks = [int(t) for t in row if t not in (self.tok.pad_id, self.tok.eos_id)]
            texts.append(self.tok.decode(toks))
            counts.append(len(toks))
        return texts, counts


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route access logs to stderr, not stdout
            print(f"{self.address_string()} {fmt % a}", file=sys.stderr)

        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok", "model": f"llama-x-tpu ({engine.config.num_layers}L)"})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/v1/completions", "/completions"):
                self._reply(404, {"error": "unknown path"})
                return
            try:
                req = json.loads(self.rfile.read(int(self.headers.get("Content-Length", 0))))
                prompt = req.get("prompt", "")
                prompts = prompt if isinstance(prompt, list) else [prompt]
                assert prompts and all(isinstance(p, str) and p for p in prompts), "prompt required"
                n = int(req.get("n", 1))
                assert 1 <= n <= 64, "n must be in [1, 64]"
                stop = req.get("stop") or []
                stop = [stop] if isinstance(stop, str) else list(stop)
                t0 = time.perf_counter()
                texts, counts = engine.complete(
                    prompts * n if n > 1 else prompts,
                    max_tokens=int(req.get("max_tokens", 64)),
                    temperature=float(req.get("temperature", 0.0)),
                    top_k=int(req.get("top_k", 0)),
                    top_p=float(req.get("top_p", 1.0)),
                    min_p=float(req.get("min_p", 0.0)),
                )
                if stop:
                    cut = []
                    for t in texts:
                        idxs = [t.index(sq) for sq in stop if sq in t]
                        cut.append(t[: min(idxs)] if idxs else t)
                    texts = cut
                dt = time.perf_counter() - t0
                self._reply(200, {
                    "object": "text_completion",
                    "choices": [
                        {"index": i, "text": t, "finish_reason": "length" if c else "stop"}
                        for i, (t, c) in enumerate(zip(texts, counts))
                    ],
                    "usage": {"completion_tokens": sum(counts), "wall_seconds": round(dt, 3)},
                })
            except Exception as e:  # noqa: BLE001 — surface the error to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    parser = argparse.ArgumentParser()
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="HF checkpoint dir or hub id")
    src.add_argument("--resume", help="training run dir (QLoRA int8/LoRA leaves serve as-is)")
    parser.add_argument("--tokenizer", default="llama3", choices=["llama2", "llama3", "byte"])
    parser.add_argument("--tokenizer_path")
    parser.add_argument("--max_seq_len", type=int, default=0)
    parser.add_argument("--kv_dtype", default="bf16", choices=["bf16", "int8"])
    parser.add_argument("--tokens_multiple", type=int, default=32,
                        help="compiled max_new_tokens granularity (executable-cache buckets)")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    engine = Engine(args)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(engine))
    print(f"serving on :{args.port} (POST /v1/completions)", file=sys.stderr, flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
