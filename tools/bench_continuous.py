"""Continuous-batching serving bench: what the slot scheduler buys on hardware.

Three measurements on one model (default: the 1B-class int8 geometry — big enough
that decode is weight-bound, small enough to sweep; --geometry 8b for the headline
single-chip serving config):

1. staggered traffic: N requests arriving mid-flight. The coalescing engine
   serializes a late arrival behind the running batch; the slot scheduler admits it
   at the next chunk boundary. Reported: aggregate tok/s and per-request
   time-to-first-token (TTFT), continuous vs serialized.
2. prefix caching: TTFT for a prompt sharing a long cached system prefix vs paying
   its own full prefill.
3. chunked prefill: a co-tenant's worst inter-chunk gap while a long prompt admits,
   with and without --prefill_chunk (head-of-line protection).

All timings are host wall-clock around stream-queue events, so the tunneled
dispatch latency (~30 ms, CLAUDE.md) rides every number equally; the comparisons
are differential. Artifact: runs/bench_serve/continuous.json.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_continuous.py
"""

import json
import queue
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate
from llama_x_tpu.serve.continuous import ContinuousScheduler
from tools.bench_serve import GEOMETRIES, build_params


def _prompts(config, lens, seed=0):
    rng = np.random.default_rng(seed)
    return [[int(t) for t in rng.integers(1, config.vocab_size, n)] for n in lens]


def timed_submit(sched, ids, max_tokens):
    """Submit one row; returns (handle, dict that will hold ttft/done timestamps
    and per-chunk arrival times)."""
    rec = {"t0": time.perf_counter(), "chunk_t": []}

    class _Q:
        def put(self, item):
            now = time.perf_counter()
            if item is not None:
                if "ttft" not in rec:
                    rec["ttft"] = now - rec["t0"]
                rec["chunk_t"].append(now)

    h = sched.submit(ids, max_tokens=max_tokens, stream_q=_Q())
    rec["handle"] = h
    return h, rec


def staggered(config, params, *, n_req=6, prompt_len=512, n_new=256, stagger_s=0.25,
              cache_dtype=jnp.bfloat16, **sched_kw):
    """n_req requests arriving stagger_s apart. Continuous: one scheduler.
    Serialized baseline: the same arrivals served one generate() at a time (what a
    busy coalescing server does to a late arrival: wait for the running batch)."""
    prompts = _prompts(config, [prompt_len] * n_req, seed=1)

    # --- continuous ---
    sched = ContinuousScheduler(params, config, cache_dtype=cache_dtype, **sched_kw)
    try:
        # warm the executables (admission bucket + decode chunk) out of band
        w, _ = timed_submit(sched, prompts[0][:prompt_len], 8)
        w.event.wait(600)
        recs = []
        t0 = time.perf_counter()
        for p in prompts:
            recs.append(timed_submit(sched, p, n_new)[1])
            time.sleep(stagger_s)
        for r in recs:
            assert r["handle"].event.wait(1200) and r["handle"].error is None
        cont_wall = time.perf_counter() - t0
        cont_toks = sum(len(r["handle"].tokens) for r in recs)
        cont_ttft = sorted(r["ttft"] for r in recs)
    finally:
        sched.close()

    # --- serialized baseline (same arrival schedule, one device program at a time;
    # arrivals queue behind the running request like a locked coalescing server) ---
    jit_gen = lambda p: np.asarray(
        generate(params, config, jnp.asarray([p], jnp.int32), max_new_tokens=n_new,
                 cache_dtype=cache_dtype))
    jit_gen(prompts[0])  # warm
    lock = threading.Lock()
    ser = []

    def serve_one(p):
        rec = {"t0": time.perf_counter()}
        with lock:
            rec["start"] = time.perf_counter()
            out = jit_gen(p)
            rec["done"] = time.perf_counter()
        # TTFT for a fused generate = the whole call (first token only exists at the end)
        rec["ttft"] = rec["done"] - rec["t0"]
        rec["n"] = out.shape[1]
        ser.append(rec)

    threads = []
    t0 = time.perf_counter()
    for p in prompts:
        th = threading.Thread(target=serve_one, args=(p,))
        th.start()
        threads.append(th)
        time.sleep(stagger_s)
    for th in threads:
        th.join(1200)
    ser_wall = time.perf_counter() - t0
    ser_toks = sum(r["n"] for r in ser)
    ser_ttft = sorted(r["ttft"] for r in ser)

    def pct(xs, q):
        return round(xs[min(len(xs) - 1, int(q * len(xs)))], 3)

    return {
        "n_req": n_req, "prompt_len": prompt_len, "n_new": n_new, "stagger_s": stagger_s,
        "continuous": {"tok_s": round(cont_toks / cont_wall, 1), "wall_s": round(cont_wall, 2),
                       "ttft_p50_s": pct(cont_ttft, 0.5), "ttft_p95_s": pct(cont_ttft, 0.95)},
        "serialized": {"tok_s": round(ser_toks / ser_wall, 1), "wall_s": round(ser_wall, 2),
                       "ttft_p50_s": pct(ser_ttft, 0.5), "ttft_p95_s": pct(ser_ttft, 0.95)},
        "tok_s_gain": round((cont_toks / cont_wall) / (ser_toks / ser_wall), 2),
    }


def prefix_ttft(config, params, *, prefix_len=2048, tail_len=32, n_new=16,
                cache_dtype=jnp.bfloat16, _warm=True, **sched_kw):
    """TTFT with a cached long prefix vs paying the prefill (same scheduler)."""
    if _warm:  # throwaway pass compiles both admission executables (jits are
        # module-level, so the cache survives the scheduler instance)
        prefix_ttft(config, params, prefix_len=prefix_len, tail_len=tail_len,
                    n_new=n_new, cache_dtype=cache_dtype, _warm=False, **sched_kw)
    sched = ContinuousScheduler(params, config, prefix_cache=4, **sched_kw,
                                cache_dtype=cache_dtype)
    try:
        base = _prompts(config, [prefix_len + tail_len], seed=2)[0]
        h, cold = timed_submit(sched, base, n_new)  # miss: full prefill, harvests
        assert h.event.wait(1200) and h.error is None
        other = base[:prefix_len] + _prompts(config, [tail_len], seed=3)[0]
        h, warm = timed_submit(sched, other, n_new)  # hit: suffix-only admission
        assert h.event.wait(1200) and h.error is None
        assert sched.prefix_hits == 1, "expected the second prompt to hit"
        return {"prefix_len": prefix_len, "tail_len": tail_len,
                "ttft_miss_s": round(cold["ttft"], 3), "ttft_hit_s": round(warm["ttft"], 3),
                "ttft_speedup": round(cold["ttft"] / warm["ttft"], 2)}
    finally:
        sched.close()


def chunked_itl(config, params, *, long_len=2048, n_new=192, chunk=128,
                cache_dtype=jnp.bfloat16, **sched_kw):
    """A streaming co-tenant's worst inter-chunk gap while a long prompt admits:
    one-shot admission stalls it for the whole prefill; chunked prefill bounds it."""
    out = {}
    for warm in (True, False):  # first lap only compiles (module-level jit cache)
      for tag, pc in (("oneshot", 0), ("chunked", chunk)):
        sched = ContinuousScheduler(params, config, prefill_chunk=pc,
                                    cache_dtype=cache_dtype, **sched_kw)
        try:
            a, rec = timed_submit(sched, _prompts(config, [64], seed=4)[0], n_new)
            while "ttft" not in rec:  # A is live and streaming
                time.sleep(0.01)
            b = sched.submit(_prompts(config, [long_len], seed=5)[0], max_tokens=8)
            assert b.event.wait(1200) and a.event.wait(1200)
            gaps = np.diff(rec["chunk_t"])
            out[tag] = {"max_gap_s": round(float(gaps.max()), 3),
                        "p50_gap_s": round(float(np.median(gaps)), 3)}
        finally:
            sched.close()
    out["long_len"] = long_len
    out["prefill_chunk"] = chunk
    out["max_gap_reduction"] = round(out["oneshot"]["max_gap_s"] / out["chunked"]["max_gap_s"], 2)
    return out


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--geometry", default="1b", choices=["1b", "8b", "tiny"])
    parser.add_argument("--out", default="runs/bench_serve/continuous.json")
    parser.add_argument("--n_slots", type=int, default=4)
    parser.add_argument("--decode_chunk", type=int, default=16)
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    if args.geometry == "tiny":  # CPU smoke for the tool itself, not a perf config
        config = llama.tiny_config(max_seq_len=512)
        params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
        kv = jnp.float32
        scale = dict(prompt_len=64, n_new=32, prefix_len=128, tail_len=16,
                     long_len=256, chunk=64)
    else:
        config = llama.LlamaConfig(**GEOMETRIES[args.geometry], max_seq_len=4096)
        params = build_params(config, quantize=True, key=jax.random.PRNGKey(0))
        kv = jnp.int8 if args.geometry == "8b" else jnp.bfloat16
        scale = {}
    kw = dict(n_slots=args.n_slots, chunk_size=args.decode_chunk,
              prompt_multiple=64 if args.geometry == "tiny" else 256)

    res = {"geometry": args.geometry, "n_slots": args.n_slots,
           "decode_chunk": args.decode_chunk,
           "weights": "int8" if args.geometry != "tiny" else "f32",
           "kv_cache": {jnp.int8: "int8", jnp.bfloat16: "bf16"}.get(kv, "f32")}
    sub = lambda *names: {k: scale[k] for k in names if k in scale}
    res["staggered"] = staggered(config, params, cache_dtype=kv, **kw,
                                 **sub("prompt_len", "n_new"))
    print(json.dumps(res["staggered"]), flush=True)
    res["prefix_ttft"] = prefix_ttft(config, params, cache_dtype=kv, **kw,
                                     **sub("prefix_len", "tail_len"))
    print(json.dumps(res["prefix_ttft"]), flush=True)
    res["chunked_prefill"] = chunked_itl(config, params, cache_dtype=kv, **kw,
                                         **sub("long_len", "chunk"))
    print(json.dumps(res["chunked_prefill"]), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
