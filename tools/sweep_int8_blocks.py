"""Block-size sweep for the Pallas int8 NT GEMM on the 8B bench's actual shapes.

Measurement note: a single dispatch through the tunneled TPU costs ~7 ms — far more
than any one GEMM — so each timing jits ONE program that ``lax.scan``s the kernel over
a stack of DIFFERENT weights (mirroring the model's layer scan; no CSE possible) and
divides by the stack depth. ±10% run-to-run variance remains (CLAUDE.md).

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
BLOCKS_N = (256, 512, 1024)
BLOCKS_K = (1024, 2048, 4096)
REPS = 8


def _timed_scan(a, ws, rs, cs, bm, bn, bk):
    @jax.jit
    def prog(a, ws):
        def body(c, wi):
            out = int8_mm_dequant_nt_pallas(a, wi, rs, cs, block_m=bm, block_n=bn, block_k=bk)
            return c + out[0, 0].astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), ws)
        return out

    float(prog(a, ws))  # compile + sync
    t0 = time.perf_counter()
    float(prog(a, ws))
    return (time.perf_counter() - t0) / ws.shape[0]


def main():
    rng = np.random.default_rng(0)
    for name, M, K, N in SHAPES:
        a = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        ws = jnp.asarray(rng.integers(-127, 128, (REPS, N, K)), jnp.int8)
        rs = jnp.ones((M,), jnp.bfloat16)
        cs = jnp.ones((N,), jnp.bfloat16)
        results = []
        for bm, bn, bk in itertools.product(BLOCKS_M, BLOCKS_N, BLOCKS_K):
            if M % bm or N % bn or K % bk:
                continue
            try:
                dt = _timed_scan(a, ws, rs, cs, bm, bn, bk)
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
