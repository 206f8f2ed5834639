"""Block-size sweep for the Pallas int8 NT GEMM on the 8B bench's actual shapes.

Measurement is DIFFERENTIAL (CLAUDE.md): a synced dispatch through the tunneled TPU
carries a ~30 ms fixed latency, so each config times a 5-rep and a 50-rep in-jit
scan chain and divides the difference by 45 — per-dispatch or plain per-rep timing
reads a ~5 ms floor for what is really a ~0.5 ms GEMM. Weights are generated
on-device (the host->device relay is ~5 MB/s).

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/sweep_int8_blocks.py
"""

import functools
import itertools
import time

import jax
import jax.numpy as jnp

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
STACK = 8  # distinct weights cycled through (keeps HBM traffic honest, prevents CSE)


def measure(a, ws, rs, cs, bm, bn, bk):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def prog(a, ws, reps):
        def body(c, i):
            wi = jax.lax.dynamic_index_in_dim(ws, i % STACK, 0, keepdims=False)
            out = int8_mm_dequant_nt_pallas(a, wi, rs, cs, block_m=bm, block_n=bn, block_k=bk)
            return c + out[0, 0].astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))[0]

    def wall(reps, n=3):
        float(prog(a, ws, reps))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(prog(a, ws, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (wall(50) - wall(5)) / 45


def main():
    for i, (name, M, K, N) in enumerate(SHAPES):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        a = jax.jit(lambda k: jax.random.randint(k, (M, K), -127, 128, jnp.int8))(k1)
        ws = jax.jit(lambda k: jax.random.randint(k, (STACK, N, K), -127, 128, jnp.int8))(k2)
        rs = jnp.ones((M,), jnp.bfloat16)
        cs = jnp.ones((N,), jnp.bfloat16)
        results = []
        for bm, bn, bk in itertools.product(BLOCKS_M, BLOCKS_N, BLOCKS_K):
            if M % bm or N % bn or K % bk:
                continue
            try:
                dt = measure(a, ws, rs, cs, bm, bn, bk)
                tops = 2 * M * N * K / dt / 1e12
                results.append((tops, (bm, bn, bk)))
                print(f"  {name} blocks {bm:5d} {bn:5d} {bk:5d}: {tops:6.1f} TOPS ({dt*1e6:.0f} us)", flush=True)
            except Exception as e:
                print(f"  {name} blocks {bm:5d} {bn:5d} {bk:5d}: FAIL {type(e).__name__}", flush=True)
        if results:
            results.sort(reverse=True)
            print(f"BEST {name}: {results[0][1]} -> {results[0][0]:.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
