"""Minimal HTTP serving front-end: OpenAI-style /v1/completions + /v1/chat/completions
(with SSE streaming) over generate().

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
  --kv_dtype int8, speculative decoding via --draft_resume/--gamma (the draft
  proposes, the target verifies — same output law, fewer target passes).
- CONCURRENT requests COALESCE: a worker thread drains the queue and runs every
  same-sampling-signature request in one ragged generate() batch (per-request rows
  split back afterwards). Compiled-shape churn is bounded on all three axes:
  max_tokens rounds up to --tokens_multiple, prompt length to --prompt_multiple,
  and batch size to the next power of two — arbitrary request mixes hit a small
  grid of cached executables instead of compiling per shape.

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


def stream_safe(text: str) -> str:
    """Hold back a possibly-incomplete trailing character. Token-by-token decode of
    a partial UTF-8 sequence yields U+FFFD replacement chars that MERGE into one
    real character (or even shrink the string) once the remaining bytes arrive —
    streamed deltas must only ever extend the text, so the undecodable tail waits
    for the next chunk (the final flush emits it verbatim if it never completes)."""
    n = 0
    while text and text[-1] == "�" and n < 3:
        text = text[:-1]
        n += 1
    return text


def next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


class _Request:
    """One client request inside the coalescing queue."""

    def __init__(self, rows, max_tokens, sig, stream_q=None):
        self.rows = rows  # list of token-id lists
        self.max_tokens = max_tokens
        self.sig = sig  # (temperature, top_k, top_p, min_p, eos_id) — batchable iff equal
        self.stream_q = stream_q  # queue.Queue of per-row text deltas; None = one-shot
        self.event = threading.Event()
        self.texts = self.counts = self.reasons = None
        self.error = None


class Engine:
    """Model + tokenizer + a coalescing worker: one device program at a time, shared
    by every queued request with the same sampling signature."""

    def __init__(self, args, _preloaded=None, _preloaded_draft=None):
        import jax
        import jax.numpy as jnp

        from llama_x_tpu.data.tokenizers import get_tokenizer

        self.args = args
        self.jnp = jnp
        self.jax = jax
        self.tok = get_tokenizer(args.tokenizer, args.tokenizer_path)
        if _preloaded is not None:  # test hook: inject params/config directly
            self.params, self.config = _preloaded
        else:
            self.params, self.config = self._load_one(args, args.resume, args.model)
        self.draft_params = self.draft_config = None
        if _preloaded_draft is not None:
            self.draft_params, self.draft_config = _preloaded_draft
        elif getattr(args, "draft_resume", None) or getattr(args, "draft_model", None):
            self.draft_params, self.draft_config = self._load_one(
                args, getattr(args, "draft_resume", None), getattr(args, "draft_model", None)
            )
            assert self.draft_config.vocab_size == self.config.vocab_size, (
                "draft and target must share the tokenizer/vocab"
            )
        self.gamma = getattr(args, "gamma", 4)
        self.cache_dtype = jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16
        self.seed = args.seed
        self.generate_calls = 0  # observability: compiled-batch invocations

        self.sched = None
        if getattr(args, "continuous", 0):
            common = dict(
                n_slots=args.continuous, chunk_size=args.decode_chunk or 16,
                prompt_multiple=args.prompt_multiple, cache_dtype=self.cache_dtype,
                pad_id=self.tok.pad_id, seed=args.seed,
            )
            if self.draft_params is not None:
                # speculative continuous batching: chunk_size counts ROUNDS per
                # dispatch (each emits up to gamma+1 tokens/row) — scale it down so
                # a chunk stays ~decode_chunk tokens
                from llama_x_tpu.serve.speculative import SpeculativeScheduler

                common["chunk_size"] = max(1, common["chunk_size"] // (self.gamma + 1))
                self.sched = SpeculativeScheduler(
                    self.params, self.config, self.draft_params, self.draft_config,
                    gamma=self.gamma, **common,
                )
            else:
                from llama_x_tpu.serve.continuous import ContinuousScheduler

                self.sched = ContinuousScheduler(
                    self.params, self.config, **common,
                    prefix_cache=getattr(args, "prefix_cache", 0),
                    prefill_chunk=getattr(args, "prefill_chunk", 0),
                )
        self._queue: list[_Request] = []
        self._cond = threading.Condition()
        self._worker = threading.Thread(target=self._run_worker, daemon=True)
        self._worker.start()

    @staticmethod
    def _load_one(args, resume, model_id):
        from pathlib import Path

        import jax
        import jax.numpy as jnp

        from llama_x_tpu.models import llama

        if resume:
            from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_params
            from llama_x_tpu.train.cli import load_model_configs

            run_dir = Path(resume)
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
            model = llama.Llama.from_hf(model_id, dtype=jnp.bfloat16)
            params, config = model.params, model.config
        if args.max_seq_len:
            config = config.replace(max_seq_len=args.max_seq_len)
        return params, config

    # ---- client side -----------------------------------------------------------

    def encode_chat(self, messages) -> list[int]:
        """Chat messages -> prompt token ids. Llama-3 gets the real instruct template
        (special header/eot ids, data/tokenizers.py); other tokenizers fall back to a
        readable role-prefixed plain-text transcript."""
        assert messages and all(
            isinstance(m, dict) and m.get("role") and isinstance(m.get("content"), str)
            for m in messages
        ), "messages must be [{role, content}, ...]"
        if hasattr(self.tok, "apply_chat_template"):
            return self.tok.apply_chat_template(messages)
        text = "".join(f"{m['role']}: {m['content'].strip()}\n" for m in messages)
        return self.tok(text + "assistant:", add_bos=True)

    @property
    def chat_eos_id(self) -> int:
        return getattr(self.tok, "eot_id", self.tok.eos_id)

    def submit(self, rows: list[list[int]], max_tokens: int, temperature: float,
               top_k: int, top_p: float, min_p: float = 0.0, eos_id: int | None = None,
               stream_q=None) -> _Request:
        """Enqueue pre-tokenized rows for the coalescing worker. Non-blocking."""
        longest = max(len(r) for r in rows)
        if longest >= self.config.max_seq_len:
            raise ValueError(
                f"longest prompt ({longest} tokens) fills the {self.config.max_seq_len} cache"
            )
        sig = (temperature, top_k, top_p, min_p,
               self.tok.eos_id if eos_id is None else eos_id)
        req = _Request(rows, max_tokens, sig, stream_q=stream_q)
        if self.sched is not None:
            return self._submit_continuous(req)
        with self._cond:
            self._queue.append(req)
            self._cond.notify()
        return req

    # ---- continuous-batching side (--continuous N): each row becomes a scheduler
    # slot tenant; a collector thread reassembles the request-level contract --------

    def _submit_continuous(self, req: _Request) -> _Request:
        import queue

        class _Tagged:  # route every row's chunk deltas into ONE multiplexed queue
            def __init__(self, q, i):
                self.q, self.i = q, i

            def put(self, item):
                self.q.put((self.i, item))

        temperature, top_k, top_p, min_p, eos_id = req.sig
        mux: queue.Queue = queue.Queue()
        handles = [
            self.sched.submit(
                row, req.max_tokens, sampling=(temperature, top_k, top_p, min_p),
                eos_id=eos_id, stream_q=_Tagged(mux, i),
            )
            for i, row in enumerate(req.rows)
        ]
        threading.Thread(
            target=self._collect_continuous, args=(req, handles, mux, eos_id), daemon=True
        ).start()
        return req

    def _collect_continuous(self, req: _Request, handles, mux, eos_id: int):
        """Assemble texts/counts/reasons (and per-chunk text deltas for streaming
        requests) from the scheduler's per-row token streams."""
        try:
            n = len(handles)
            toks: list[list[int]] = [[] for _ in range(n)]
            prev = [""] * n
            live = n
            while live:
                i, item = mux.get()
                if item is None:
                    live -= 1
                    continue
                toks[i].extend(item)
                if req.stream_q is not None:
                    text = stream_safe(self.tok.decode(
                        [t for t in toks[i] if t not in (self.tok.pad_id, eos_id)]))
                    deltas = [""] * n
                    deltas[i] = text[len(prev[i]):]
                    prev[i] = text
                    if any(deltas):
                        req.stream_q.put(deltas)
            for h in handles:
                h.event.wait()
                if h.error is not None:
                    raise h.error
            kept = [[t for t in h.tokens if t not in (self.tok.pad_id, eos_id)]
                    for h in handles]
            req.texts = [self.tok.decode(k) for k in kept]
            if req.stream_q is not None:
                # flush what stream_safe held back (an incomplete tail that never
                # completed, or the last merged character)
                finals = [t[len(p):] for t, p in zip(req.texts, prev)]
                if any(finals):
                    req.stream_q.put(finals)
            req.counts = [len(k) for k in kept]
            req.reasons = [h.finish_reason for h in handles]
        except Exception as e:  # noqa: BLE001 — deliver to the waiter
            req.error = e
        finally:
            if req.stream_q is not None:
                req.stream_q.put(None)
            req.event.set()

    def complete(self, prompts: list[str], max_tokens: int, temperature: float,
                 top_k: int, top_p: float, min_p: float = 0.0):
        """Tokenize, enqueue, block until the coalescing worker answers.
        -> (texts, counts, reasons) per row; reasons is 'stop' (hit eos) or 'length'."""
        rows = [self.tok(p, add_bos=True) for p in prompts]
        req = self.submit(rows, max_tokens, temperature, top_k, top_p, min_p)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.texts, req.counts, req.reasons

    # ---- worker side -----------------------------------------------------------

    def _run_worker(self):
        while True:
            with self._cond:
                while not self._queue:
                    self._cond.wait()
            # brief window so bursts arriving together coalesce into one batch
            if self.args.batch_window_ms:
                time.sleep(self.args.batch_window_ms / 1e3)
            with self._cond:
                sig = self._queue[0].sig
                group = [r for r in self._queue if r.sig == sig]
                self._queue = [r for r in self._queue if r.sig != sig]
            try:
                self._run_batch(group, sig)
            except Exception as e:  # noqa: BLE001 — deliver to every waiter
                for r in group:
                    r.error = e
            finally:
                for r in group:
                    if r.stream_q is not None:
                        r.stream_q.put(None)  # sentinel: no more deltas
                    r.event.set()

    def _run_batch(self, group: list[_Request], sig):
        import numpy as np

        from llama_x_tpu.models.generate import generate, generate_stream
        from llama_x_tpu.models.speculative import generate_speculative

        jnp = self.jnp
        temperature, top_k, top_p, min_p, eos_id = sig
        rows = [r for req in group for r in req.rows]
        speculative = self.draft_params is not None

        # shape bucketing: prompt length, generated length, and batch size all round
        # up so arbitrary request mixes reuse a small executable grid
        P = next_multiple(max(len(r) for r in rows), self.args.prompt_multiple)
        spec_slack = (self.gamma + 1) if speculative else 0
        P = min(P, self.config.max_seq_len - spec_slack - 1)
        budget = self.config.max_seq_len - P - spec_slack
        if speculative:  # the draft's cache must hold P + n_new + gamma too
            budget = min(budget, self.draft_config.max_seq_len - P - self.gamma)
        assert budget >= 1, f"prompts of length {max(len(r) for r in rows)} leave no decode budget"
        want_new = max(req.max_tokens for req in group)
        n_new = min(next_multiple(want_new, self.args.tokens_multiple), budget)
        B = next_pow2(len(rows))

        padded = np.full((B, P), self.tok.pad_id, np.int32)
        lens = np.ones((B,), np.int32)  # dummy rows: 1-token prompts, output discarded
        padded[:, 0] = rows[0][0]
        for i, r in enumerate(rows):
            padded[i, : len(r)] = r[:P]
            lens[i] = min(len(r), P)

        self.seed += 1
        self.generate_calls += 1
        common = dict(
            max_new_tokens=n_new, key=self.jax.random.PRNGKey(self.seed),
            temperature=temperature, top_k=top_k, top_p=top_p, min_p=min_p,
            eos_id=eos_id, pad_id=self.tok.pad_id,
            prompt_lens=jnp.asarray(lens), cache_dtype=self.cache_dtype,
        )
        streaming = [req for req in group if req.stream_q is not None]
        chunked = (streaming or self.args.decode_chunk > 0) and not speculative

        def push_deltas(out_np, prev_texts):
            """Send each streaming request its rows' new text since the last chunk."""
            at = 0
            for req in group:
                if req.stream_q is not None:
                    deltas = []
                    for i, row in enumerate(out_np[at : at + len(req.rows), : req.max_tokens]):
                        toks = [int(t) for t in row if t not in (self.tok.pad_id, eos_id)]
                        text = self.tok.decode(toks)
                        prev = prev_texts.setdefault(req, [""] * len(req.rows))
                        deltas.append(text[len(prev[i]):])
                        prev[i] = text
                    if any(deltas):
                        req.stream_q.put(deltas)
                at += len(req.rows)

        if chunked:
            # resumable decode: early-exits once every row is done, and streams text
            # deltas per chunk (models/generate.py generate_stream — parity-pinned
            # against the one-shot program)
            prev_texts: dict[_Request, list[str]] = {}
            blocks = []
            for block in generate_stream(
                self.params, self.config, jnp.asarray(padded),
                chunk_size=self.args.decode_chunk or 16, **common,
            ):
                blocks.append(np.asarray(block))
                if streaming:
                    push_deltas(np.concatenate(blocks, axis=1), prev_texts)
            out = np.concatenate(blocks, axis=1)
            if out.shape[1] < n_new:  # early exit: missing columns are all-pad
                pad = np.full((B, n_new - out.shape[1]), self.tok.pad_id, np.int32)
                out = np.concatenate([out, pad], axis=1)
        else:
            if speculative:
                out, _stats = generate_speculative(
                    self.params, self.config, self.draft_params, self.draft_config,
                    jnp.asarray(padded), gamma=self.gamma, **common,
                )
            else:
                out = generate(self.params, self.config, jnp.asarray(padded), **common)
            out = np.asarray(out)
            if streaming:  # speculative path has no chunk stream: one final delta
                push_deltas(out, {})

        at = 0
        for req in group:
            texts, counts, reasons = [], [], []
            for row in out[at : at + len(req.rows), : req.max_tokens]:
                toks = [int(t) for t in row if t not in (self.tok.pad_id, eos_id)]
                texts.append(self.tok.decode(toks))
                counts.append(len(toks))
                # eos within the requested window -> the model stopped on its own
                reasons.append("stop" if (row == eos_id).any() else "length")
            req.texts, req.counts, req.reasons = texts, counts, reasons
            at += len(req.rows)


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
                self._reply(200, {"status": "ok", "model": f"llama-x-tpu ({engine.config.num_layers}L)",
                                  "speculative": engine.draft_params is not None})
            else:
                self._reply(404, {"error": "unknown path"})

        def _sse_begin(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()

        def _sse_event(self, obj):
            self.wfile.write(b"data: " + json.dumps(obj).encode() + b"\n\n")
            self.wfile.flush()

        def _stream(self, rows, sampling, chat: bool, eos_id=None):
            """SSE response: one event per decode chunk with per-choice text deltas,
            then a finish event and the OpenAI '[DONE]' terminator."""
            import queue

            q: queue.Queue = queue.Queue()
            req = engine.submit(rows, eos_id=eos_id, stream_q=q, **sampling)
            self._sse_begin()
            obj = "chat.completion.chunk" if chat else "text_completion.chunk"
            while True:
                deltas = q.get()
                if deltas is None:
                    break
                self._sse_event({
                    "object": obj,
                    "choices": [
                        {"index": i,
                         **({"delta": {"content": d}} if chat else {"text": d})}
                        for i, d in enumerate(deltas) if d
                    ],
                })
            req.event.wait()
            if req.error is not None:
                self._sse_event({"error": f"{type(req.error).__name__}: {req.error}"})
            else:
                self._sse_event({
                    "object": obj,
                    "choices": [
                        {"index": i, "finish_reason": fr,
                         **({"delta": {}} if chat else {"text": ""})}
                        for i, fr in enumerate(req.reasons)
                    ],
                })
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()

        @staticmethod
        def _parse_sampling(req):
            return dict(
                max_tokens=int(req.get("max_tokens", 64)),
                temperature=float(req.get("temperature", 0.0)),
                top_k=int(req.get("top_k", 0)),
                top_p=float(req.get("top_p", 1.0)),
                min_p=float(req.get("min_p", 0.0)),
            )

        @staticmethod
        def _apply_stop(texts, reasons, stop):
            cut, creas = [], []
            for t, fr in zip(texts, reasons):
                idxs = [t.index(sq) for sq in stop if sq in t]
                cut.append(t[: min(idxs)] if idxs else t)
                creas.append("stop" if idxs else fr)
            return cut, creas

        def do_POST(self):
            try:
                req = json.loads(self.rfile.read(int(self.headers.get("Content-Length", 0))))
                if self.path in ("/v1/completions", "/completions"):
                    self._completions(req)
                elif self.path in ("/v1/chat/completions", "/chat/completions"):
                    self._chat(req)
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — surface the error to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def _completions(self, req):
            prompt = req.get("prompt", "")
            prompts = prompt if isinstance(prompt, list) else [prompt]
            assert prompts and all(isinstance(p, str) and p for p in prompts), "prompt required"
            n = int(req.get("n", 1))
            assert 1 <= n <= 64, "n must be in [1, 64]"
            stop = req.get("stop") or []
            stop = [stop] if isinstance(stop, str) else list(stop)
            sampling = self._parse_sampling(req)
            if req.get("stream"):
                rows = [engine.tok(p, add_bos=True) for p in (prompts * n if n > 1 else prompts)]
                self._stream(rows, sampling, chat=False)
                return
            t0 = time.perf_counter()
            texts, counts, reasons = engine.complete(
                prompts * n if n > 1 else prompts, **sampling)
            if stop:
                texts, reasons = self._apply_stop(texts, reasons, stop)
            dt = time.perf_counter() - t0
            self._reply(200, {
                "object": "text_completion",
                "choices": [
                    {"index": i, "text": t, "finish_reason": fr}
                    for i, (t, fr) in enumerate(zip(texts, reasons))
                ],
                "usage": {"completion_tokens": sum(counts), "wall_seconds": round(dt, 3)},
            })

        def _chat(self, req):
            messages = req.get("messages")
            rows = [engine.encode_chat(messages)]
            stop = req.get("stop") or []
            stop = [stop] if isinstance(stop, str) else list(stop)
            sampling = self._parse_sampling(req)
            if req.get("stream"):
                self._stream(rows, sampling, chat=True, eos_id=engine.chat_eos_id)
                return
            t0 = time.perf_counter()
            r = engine.submit(rows, eos_id=engine.chat_eos_id, **sampling)
            r.event.wait()
            if r.error is not None:
                raise r.error
            texts, reasons = r.texts, r.reasons
            if stop:
                texts, reasons = self._apply_stop(texts, reasons, stop)
            dt = time.perf_counter() - t0
            self._reply(200, {
                "object": "chat.completion",
                "choices": [
                    {"index": 0, "message": {"role": "assistant", "content": texts[0]},
                     "finish_reason": reasons[0]},
                ],
                "usage": {"completion_tokens": r.counts[0], "wall_seconds": round(dt, 3)},
            })

    return Handler


def build_parser():
    parser = argparse.ArgumentParser()
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help="HF checkpoint dir or hub id")
    src.add_argument("--resume", help="training run dir (QLoRA int8/LoRA leaves serve as-is)")
    parser.add_argument("--draft_resume", help="draft run dir: serve with speculative decoding")
    parser.add_argument("--draft_model", help="draft HF checkpoint (alternative to --draft_resume)")
    parser.add_argument("--gamma", type=int, default=4, help="draft tokens per verify pass")
    parser.add_argument("--tokenizer", default="llama3", choices=["llama2", "llama3", "byte"])
    parser.add_argument("--tokenizer_path")
    parser.add_argument("--max_seq_len", type=int, default=0)
    parser.add_argument("--kv_dtype", default="bf16", choices=["bf16", "int8"])
    parser.add_argument("--tokens_multiple", type=int, default=32,
                        help="compiled max_new_tokens granularity (executable-cache buckets)")
    parser.add_argument("--prompt_multiple", type=int, default=64,
                        help="compiled prompt-length granularity (executable-cache buckets)")
    parser.add_argument("--batch_window_ms", type=int, default=5,
                        help="coalescing window: how long the worker waits for more requests")
    parser.add_argument("--continuous", type=int, default=0,
                        help="continuous batching with this many decode slots: requests "
                        "join/leave the running batch at chunk boundaries (late arrivals "
                        "never wait for earlier batches; per-row sampling/eos/budget are "
                        "traced, so traffic mixes share ONE compiled step). 0 = coalescing "
                        "batches (the default path). With --draft_resume/--draft_model the "
                        "chunk step becomes speculative draft/verify rounds.")
    parser.add_argument("--prefix_cache", type=int, default=0,
                        help="with --continuous: automatic prefix caching — keep KV for up "
                        "to this many bucket-aligned prompt prefixes and admit prompts that "
                        "share one by prefilling only the suffix (TTFT win for repeated "
                        "system prompts). 0 = off.")
    parser.add_argument("--prefill_chunk", type=int, default=0,
                        help="with --continuous: chunked prefill — admissions run this many "
                        "prompt tokens per dispatch, interleaved with co-tenants' decode "
                        "chunks (bounds their inter-token latency against long-prompt "
                        "arrivals). 0 = one-shot prefill per admission.")
    parser.add_argument("--decode_chunk", type=int, default=32,
                        help="decode in resumable chunks of this many tokens: streams SSE "
                        "deltas and stops early once every row is done (0 = one fused "
                        "generate() per batch; streaming requests force chunks)")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def main():
    args = build_parser().parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    engine = Engine(args)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(engine))
    mode = f"speculative gamma={engine.gamma}" if engine.draft_params is not None else "plain"
    print(f"serving on :{args.port} (POST /v1/completions, {mode})", file=sys.stderr, flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
