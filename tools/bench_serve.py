"""Serving throughput: int8 weight-only decode vs bf16, and 8B-geometry serving.

Decode at small batch is weight-bandwidth-bound (every generated token reads every
weight once), so int8 weights — the same rowwise quantization the trainer uses
(adapters/quantize.py) — halve HBM traffic per token and serve straight from a QLoRA
run's checkpoint, no export step. At Llama-3.1-8B geometry the bf16 weights alone are
~16 GB and do NOT fit a 16 GB v5e chip next to the KV cache; int8 (~8 GB) is what
makes single-chip 8B serving possible at all, so the 8B rows are int8-only by
physics, not by choice.

The reference has no serving surface (SURVEY.md §3: no sampling loop anywhere); its
int8 path is training-only. Artifact: runs/bench_serve/serve.json.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_serve.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.models import llama
from llama_x_tpu.models.generate import generate

GEOMETRIES = {
    # 1.1B-class: fits in bf16 AND int8 -> measures the int8 speedup directly
    "1b": dict(embed_dim=2048, num_layers=16, head_dim=128, num_heads=16,
               num_kv_heads=8, intermediate_dim=5632, vocab_size=32_000),
    # Llama-3.1-8B geometry: int8-only (bf16 weights alone exceed the 16 GB chip)
    "8b": dict(embed_dim=4096, num_layers=32, head_dim=128, num_heads=32,
               num_kv_heads=8, intermediate_dim=14336, vocab_size=128_256,
               rope_base=500_000.0, is_llama3_1=True),
}


def build_params(config, quantize: bool, key):
    """Random init on-device (host->device relay is ~5 MB/s; see bench.py)."""
    from llama_x_tpu.adapters import quantize_linear

    if config.embed_dim <= 2048:
        params = llama.init(key, config, dtype=jnp.bfloat16)
        if quantize:
            params = dict(params, layers=quantize_linear(params["layers"], "int8"))
        return params

    # 8B: generate int8 + scales directly (quantizing a materialized bf16 tree would
    # need the 16 GB it cannot have); embeddings/head/norms stay bf16 like QLoRA
    assert quantize, "8B bf16 does not fit a 16 GB chip"
    L, D = config.num_layers, config.embed_dim
    HD, NH, NKV = config.head_dim, config.num_heads, config.num_kv_heads
    F, V = config.intermediate_dim, config.vocab_size
    kit = iter(jax.random.split(key, 16))

    def qlin(fan_in, fan_out):
        int_data = jax.jit(
            lambda k: jax.random.randint(k, (L, fan_out, fan_in), -127, 128, jnp.int8)
        )(next(kit))
        s = 0.02 / (73.3 * fan_in**0.5)  # dequantized std ~0.02/sqrt(fan_in), bench.py
        return {"int_data": int_data, "scale": jnp.full((L, fan_out), s, jnp.bfloat16)}

    def emb(shape):
        return jax.jit(lambda k: (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(jnp.bfloat16))(next(kit))

    return {
        "tok_embeddings": {"weight": emb((V, D))},
        "layers": {
            "attention_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attention": {"wq": qlin(D, NH * HD), "wk": qlin(D, NKV * HD),
                          "wv": qlin(D, NKV * HD), "wo": qlin(NH * HD, D)},
            "ffn_norm": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "feed_forward": {"w1": qlin(D, F), "w3": qlin(D, F), "w2": qlin(F, D)},
        },
        "norm": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "output": {"kernel": emb((D, V))},
    }


def bench(config, params, B, n_new=128, prompt_len=512, cache_dtype=jnp.bfloat16):
    prompt = jnp.asarray(np.random.default_rng(0).integers(1, config.vocab_size, (B, prompt_len)), jnp.int32)
    run = lambda: generate(params, config, prompt, max_new_tokens=n_new, cache_dtype=cache_dtype)
    out = np.asarray(run())  # compile
    t0 = time.perf_counter()
    out = np.asarray(run())
    dt = time.perf_counter() - t0
    return B * n_new / dt


def main():
    import argparse
    import json
    from pathlib import Path

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="runs/bench_serve/serve.json")
    parser.add_argument("--new_tokens", type=int, default=128)
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    rows = []

    # --- 1B: bf16 vs int8, same weights quantized ---
    for B in (1, 8):
        row = {"geometry": "1b", "B": B, "cache_len": 4096}
        for tag, quant in (("bf16", False), ("int8", True)):
            config = llama.LlamaConfig(**GEOMETRIES["1b"], max_seq_len=4096)
            params = build_params(config, quant, jax.random.PRNGKey(0))
            row[f"{tag}_tok_s"] = round(bench(config, params, B, args.new_tokens), 1)
            del params
        row["int8_speedup"] = round(row["int8_tok_s"] / row["bf16_tok_s"], 3)
        rows.append(row)
        print(f"1b B={B}: bf16 {row['bf16_tok_s']:7.1f} tok/s | int8 {row['int8_tok_s']:7.1f} tok/s "
              f"| speedup {row['int8_speedup']:.2f}x", flush=True)

    # --- 8B int8 weights: the single-chip serving configuration. With a bf16 KV
    # cache, B=8 @ 4k OOMs (8 GB weights + 8.6 GB KV, measured 16.53G/15.75G) — B=4
    # is that config's ceiling. The int8 KV cache (cache_dtype=int8) halves cache
    # residency, so B=8 fits and becomes the single-chip throughput point. ---
    config = llama.LlamaConfig(**GEOMETRIES["8b"], max_seq_len=4096)
    params = build_params(config, True, jax.random.PRNGKey(1))
    for B, kv in ((1, "bf16"), (1, "int8"), (4, "bf16"), (4, "int8"), (8, "int8")):
        try:
            tps = bench(config, params, B, args.new_tokens,
                        cache_dtype=jnp.int8 if kv == "int8" else jnp.bfloat16)
        except Exception as e:  # noqa: BLE001 — record, keep the run alive
            rows.append({"geometry": "8b", "B": B, "cache_len": 4096, "kv": kv,
                         "error": type(e).__name__})
            print(f"8b B={B} kv={kv}: FAIL {type(e).__name__}", flush=True)
            continue
        rows.append({"geometry": "8b", "B": B, "cache_len": 4096, "kv": kv,
                     "int8_tok_s": round(tps, 1)})
        print(f"8b B={B} kv={kv}: {tps:7.1f} tok/s", flush=True)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({"prefill": 512, "new_tokens": args.new_tokens, "rows": rows}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
