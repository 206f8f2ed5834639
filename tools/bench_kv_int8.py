"""int8 KV cache serving bench: bf16 vs int8 cache decode throughput + capacity.

Decode at serving batch is HBM-bound and the cache dominates the traffic once
B * S_live * layers is large (at B=8, S=16k, 8 layers the bf16 cache is 4.3 GB read
every token vs 1.1 GB of weights). The int8 cache (models/llama.py init_kv_cache
dtype=int8; rowwise scales, in-VMEM dequant in decode_attention_int8) halves those
reads and halves residency, so it should approach 2x on cache-dominated rows and
additionally FIT configs the bf16 cache cannot.

Artifact: runs/bench_kv_int8/kv_int8.json
usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_kv_int8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate

GEOM = dict(embed_dim=2048, num_layers=16, head_dim=128, num_heads=16,
            num_kv_heads=8, intermediate_dim=5632, vocab_size=32_000)


def bench(config, B, cache_dtype, n_new=128, prompt_len=512):
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(1, config.vocab_size, (B, prompt_len)), jnp.int32
    )
    run = lambda: generate(params, config, prompt, max_new_tokens=n_new, cache_dtype=cache_dtype)
    out = np.asarray(run())  # compile + sync (block_until_ready is a no-op here)
    t0 = time.perf_counter()
    out = np.asarray(run())
    dt = time.perf_counter() - t0
    return B * n_new / dt, out


def main():
    import argparse
    import json
    from pathlib import Path

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="runs/bench_kv_int8/kv_int8.json")
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    rows = []
    # same matrix as bench_decode's cache-dominated rows (its layer counts exist
    # because bf16 blows HBM — exactly the constraint int8 relaxes)
    for B, S_max, n_layers in ((8, 4096, 16), (16, 4096, 16), (8, 16_384, 8), (16, 16_384, 4)):
        config = llama.LlamaConfig(**dict(GEOM, num_layers=n_layers), max_seq_len=S_max, attn_impl="auto")
        row = {"B": B, "cache_len": S_max, "num_layers": n_layers}
        outs = {}
        for tag, dt_ in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
            tps, outs[tag] = bench(config, B, dt_)
            row[f"{tag}_tok_s"] = round(tps, 1)
        row["speedup"] = round(row["int8_tok_s"] / row["bf16_tok_s"], 3)
        row["first_token_agreement"] = float((outs["bf16"][:, 0] == outs["int8"][:, 0]).mean())
        rows.append(row)
        print(
            f"B={B:3d} cache={S_max:6d} L={n_layers}: bf16 {row['bf16_tok_s']:7.1f} tok/s | "
            f"int8 {row['int8_tok_s']:7.1f} tok/s | {row['speedup']:.2f}x | "
            f"first-token agreement {row['first_token_agreement']:.3f}",
            flush=True,
        )

    # capacity row: 16 layers at B=8/16k — the bf16 cache alone is 8.6 GB and the row
    # is absent from bench_decode for that reason; int8 is 4.3 GB and should fit
    try:
        config = llama.LlamaConfig(**GEOM, max_seq_len=16_384, attn_impl="auto")
        tps, _ = bench(config, 8, jnp.int8)
        rows.append({"B": 8, "cache_len": 16_384, "num_layers": 16,
                     "int8_tok_s": round(tps, 1), "note": "bf16 cache does not fit this config"})
        print(f"capacity row (B=8, 16k, L=16, int8-only): {tps:.1f} tok/s", flush=True)
    except Exception as e:  # noqa: BLE001 — record the failure, don't lose the run
        rows.append({"B": 8, "cache_len": 16_384, "num_layers": 16, "error": type(e).__name__})
        print(f"capacity row failed: {type(e).__name__}", flush=True)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({"geometry": "1.1B-class hd128", "prefill": 512,
                                    "new_tokens": 128, "rows": rows}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
