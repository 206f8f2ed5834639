"""Decode throughput: prefill 512 + 128-token greedy scan on a 1.1B-class model,
XLA decode path vs the Pallas decode kernel (ops/decode_attention.py), over batch.

B=1 decode is weight-bandwidth-bound (2.2 GB bf16 weights/token over ~800 GB/s HBM
-> ~363 tok/s ceiling on v5e) and the cache is a rounding error. At serving batch
sizes the KV cache dominates HBM traffic — the decode kernel reads only the live
prefix (O(kv_len)) instead of the whole static cache, which is where the win is.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_decode.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate


def bench(config, B, n_new=128, prompt_len=512):
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    prompt = jnp.asarray(np.random.default_rng(0).integers(1, config.vocab_size, (B, prompt_len)), jnp.int32)
    out = np.asarray(generate(params, config, prompt, max_new_tokens=n_new))  # compile
    t0 = time.perf_counter()
    out = generate(params, config, prompt, max_new_tokens=n_new)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    return dt, B * n_new / dt, out


def main():
    base = dict(embed_dim=2048, num_layers=16, head_dim=128, num_heads=16,
                num_kv_heads=8, intermediate_dim=5632, vocab_size=32_000)
    # (B, max_seq_len): the kernel's O(kv_len) reads matter most when the static cache
    # is sized for long context but the live prefix is short (the serving-common case)
    for B, S_max in ((1, 2048), (8, 2048), (32, 2048), (8, 8192)):
        row = {}
        outs = {}
        for impl in ("xla", "auto"):
            config = llama.LlamaConfig(**base, max_seq_len=S_max, attn_impl=impl)
            dt, tps, out = bench(config, B)
            row[impl] = tps
            outs[impl] = np.asarray(out)
        agree = float((outs["xla"] == outs["auto"]).mean())
        print(
            f"B={B:3d} cache={S_max}: xla {row['xla']:7.1f} tok/s | pallas-decode "
            f"{row['auto']:7.1f} tok/s | speedup {row['auto']/row['xla']:.2f}x "
            f"| token agreement {agree:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
