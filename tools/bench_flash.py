"""Differential microbench of the flash attention kernels on the 8B bench attention
shape (B=1, S=4096, Hq=32, Hkv=8, D=128, causal + bidirectional audio prefix ~2000),
measured through the public entry (model layout in/out, i.e. including transposes).

Timing is differential (chained in-jit reps, N_large - N_small) because every synced
dispatch carries ~30 ms of tunnel latency (CLAUDE.md).

History (runs/profile_8b/flash_native.json): a layout-native kernel variant
(lane-sliced [bq, group*D] q blocks, k/v lane slices, no transposes) was built and
measured SLOWER than the head-major kernels + transposes — fwd 0.85x, fwd+bwd 0.81x —
because per-head [bq, D] matmuls fragment the MXU and the 256-byte-chunk strided k/v
DMA costs more than the transposes it removes. The variant was removed; this tool now
tracks the surviving kernels so before/after numbers stay comparable across commits.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--block_q", type=int, default=256)
    ap.add_argument("--block_kv", type=int, default=1024)
    ap.add_argument("--out", default="runs/profile_8b/flash_kernel.json")
    args = ap.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_x_tpu.ops import flash_attention as fa
    from llama_x_tpu.ops.attention import MaskInfo

    B, S, Hq, Hkv, D = 1, 4096, 32, 8, 128
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape, np.float32) * 0.3, jnp.bfloat16)
    q, k, v = mk((B, S, Hq, D)), mk((B, S, Hkv, D)), mk((B, S, Hkv, D))
    ct = mk((B, S, Hq, D))
    mi = MaskInfo(causal=True, prefix_len=jnp.asarray([2000], jnp.int32))

    def path(q, k, v):
        return fa.flash_attention(q, k, v, mi, block_q=args.block_q, block_kv=args.block_kv)

    def chain_fwd(n):
        def g(q):
            def body(q, _):
                return (path(q, k, v), None)
            q, _ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(q.astype(jnp.float32))
        return jax.jit(g)

    def chain_bwd(n):
        def g(q):
            def body(q, _):
                def loss(q):
                    return jnp.sum((path(q, k, v) * ct).astype(jnp.float32))
                dq = jax.grad(loss)(q)
                return (q + dq.astype(q.dtype) * jnp.bfloat16(1e-6), None)
            q, _ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(q.astype(jnp.float32))
        return jax.jit(g)

    def timeit(fn):
        float(fn(q))  # compile + sync (block_until_ready does not sync on the tunnel)
        t0 = time.perf_counter()
        float(fn(q))
        return time.perf_counter() - t0

    results = {}
    for mode, chain in (("fwd", chain_fwd), ("fwd+bwd", chain_bwd)):
        tl = timeit(chain(args.reps))
        ts = timeit(chain(args.small))
        per = (tl - ts) / (args.reps - args.small) * 1e3
        results[f"{mode}_ms"] = round(per, 3)
        print(f"{mode:8s} {per:8.3f} ms/call", flush=True)

    results["shape"] = (
        f"B{B} S{S} Hq{Hq} Hkv{Hkv} D{D} causal+prefix2000 "
        f"bq{args.block_q} bk{args.block_kv} (through model-layout transposes)"
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
