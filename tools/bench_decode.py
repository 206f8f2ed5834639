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
from llama_x_tpu.ops import decode_attention as da


def bench(config, B, n_new=128, prompt_len=512):
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    prompt = jnp.asarray(np.random.default_rng(0).integers(1, config.vocab_size, (B, prompt_len)), jnp.int32)
    out = np.asarray(generate(params, config, prompt, max_new_tokens=n_new))  # compile
    t0 = time.perf_counter()
    out = generate(params, config, prompt, max_new_tokens=n_new)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    return dt, B * n_new / dt, out


GEOMETRIES = {
    # 1.1B-class hd=128 (the original sweep geometry)
    "hd128": dict(embed_dim=2048, num_layers=16, head_dim=128, num_heads=16,
                  num_kv_heads=8, intermediate_dim=5632, vocab_size=32_000),
    # TinyLlama-class hd=64 (the framework's default --model). The kernel computes
    # hd=64 correctly but measured 0.5-0.8x XLA, so the router keeps it on XLA;
    # this bench forces the kernel (FORCE_KERNEL) to keep that measurement current.
    "hd64": dict(embed_dim=2048, num_layers=16, head_dim=64, num_heads=32,
                 num_kv_heads=4, intermediate_dim=5632, vocab_size=32_000),
}


def main():
    import argparse
    import json
    from pathlib import Path

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="runs/bench_decode/decode.json")
    parser.add_argument("--geometries", nargs="+", default=["hd128", "hd64"], choices=list(GEOMETRIES))
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    rows = []
    for geom in args.geometries:
        base = GEOMETRIES[geom]
        # (B, max_seq_len, num_layers): the kernel's O(kv_len) reads matter most when
        # the static cache is sized for long context but the live prefix is short (the
        # serving-common case) — VERDICT r2 #8's matrix: B in {1, 8, 16}, 4k / 16k.
        # 16k rows drop to 8 layers: a 16-layer B=8 16k bf16 cache alone is 8.6 GB and
        # the XLA variant's temps blow the 16 GB chip (measured RESOURCE_EXHAUSTED).
        for B, S_max, n_layers in (
            (1, 4096, 16), (8, 4096, 16), (16, 4096, 16), (8, 16_384, 8), (16, 16_384, 4),
        ):
            row = {"geometry": geom, "B": B, "cache_len": S_max, "num_layers": n_layers}
            outs = {}
            # hd=64 is deliberately routed to XLA (see ops/decode_attention.py), so
            # "auto" would just re-measure XLA there — force the kernel instead to
            # keep quantifying the routing decision on whatever hardware this runs on.
            force = base["head_dim"] % 128 != 0
            row["kernel_forced"] = force
            for impl in ("xla", "auto"):
                da.FORCE_KERNEL = force and impl == "auto"
                try:
                    config = llama.LlamaConfig(
                        **dict(base, num_layers=n_layers), max_seq_len=S_max, attn_impl=impl
                    )
                    dt, tps, out = bench(config, B)
                finally:
                    da.FORCE_KERNEL = False
                row[f"{impl}_tok_s"] = round(tps, 1)
                outs[impl] = np.asarray(out)
            row["speedup"] = round(row["auto_tok_s"] / row["xla_tok_s"], 3)
            # Correctness probe: after an IDENTICAL prefill, the first greedy token of
            # each impl must agree (modulo bf16 argmax ties on random-init logits).
            # Full-sequence agreement is NOT a correctness metric for free-running
            # greedy decode: random weights give near-uniform logits, so one flipped
            # tie diverges the remaining trajectory — exactness is enforced by
            # tests/test_decode_attention.py against the dense oracle instead.
            row["first_token_agreement"] = float((outs["xla"][:, 0] == outs["auto"][:, 0]).mean())
            row["token_agreement_free_running"] = float((outs["xla"] == outs["auto"]).mean())
            rows.append(row)
            print(
                f"{geom} B={B:3d} cache={S_max}: xla {row['xla_tok_s']:7.1f} tok/s | "
                f"pallas-decode {row['auto_tok_s']:7.1f} tok/s | speedup {row['speedup']:.2f}x "
                f"| first-token agreement {row['first_token_agreement']:.3f}",
                flush=True,
            )

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({"prefill": 512, "new_tokens": 128, "rows": rows}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
