"""Block-size sweep for the Pallas int8 NT GEMM on the 8B bench's actual shapes.

The (512, 512, 2048) default was tuned on a square 4096^3 sweep (r1); the 8B step's
GEMMs are skinny/fat (N=14336 MLP up, K=14336 MLP down, N=1024 kv proj) — this sweeps
the NT kernel per shape and prints the best config, to re-tune defaults with evidence.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/sweep_int8_blocks.py
"""

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.ops.int8_mm import int8_mm_dequant_nt_pallas

SHAPES = [  # (M, K, N) for out[M,N] = a[M,K] @ w[N,K].T — the 8B S=4096 projections
    ("wq/wo 4096x4096x4096", 4096, 4096, 4096),
    ("wk/wv 4096x4096x1024", 4096, 4096, 1024),
    ("w1/w3 4096x4096x14336", 4096, 4096, 14336),
    ("w2   4096x14336x4096", 4096, 14336, 4096),
]
BLOCKS_M = (256, 512, 1024)
BLOCKS_N = (256, 512, 1024, 2048)
BLOCKS_K = (1024, 2048, 4096)


def main():
    rng = np.random.default_rng(0)
    for name, M, K, N in SHAPES:
        a = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
        rs = jnp.ones((M,), jnp.bfloat16)
        cs = jnp.ones((N,), jnp.bfloat16)
        results = []
        for bm, bn, bk in itertools.product(BLOCKS_M, BLOCKS_N, BLOCKS_K):
            if M % bm or N % bn or K % bk:
                continue
            try:
                out = int8_mm_dequant_nt_pallas(a, w, rs, cs, block_m=bm, block_n=bn, block_k=bk)
                float(jnp.sum(out.astype(jnp.float32)))  # sync (block_until_ready lies on axon)
                t0 = time.perf_counter()
                for _ in range(5):
                    out = int8_mm_dequant_nt_pallas(a, w, rs, cs, block_m=bm, block_n=bn, block_k=bk)
                float(jnp.sum(out.astype(jnp.float32)))
                dt = (time.perf_counter() - t0) / 5
                tops = 2 * M * N * K / dt / 1e12
                results.append((tops, (bm, bn, bk)))
                print(f"  {name} blocks {bm:5d} {bn:5d} {bk:5d}: {tops:6.1f} TOPS", flush=True)
            except Exception as e:
                print(f"  {name} blocks {bm:5d} {bn:5d} {bk:5d}: FAIL {type(e).__name__}", flush=True)
        if results:
            results.sort(reverse=True)
            print(f"BEST {name}: {results[0][1]} -> {results[0][0]:.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
