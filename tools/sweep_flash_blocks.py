"""Differential block sweep for the Pallas flash-attention kernel at the 8B bench's
attention shape (B=1, Hq=32, Hkv=8, S=4096, D=128, prefix-LM mask), fwd and fwd+bwd.

Differential timing per CLAUDE.md: (50-rep chain - 5-rep chain) / 45 inside one jit.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/sweep_flash_blocks.py
"""

import functools
import time

import jax
import jax.numpy as jnp

from llama_x_tpu.ops.attention import MaskInfo
from llama_x_tpu.ops.flash_attention import flash_attention

B, Hq, Hkv, S, D = 1, 32, 8, 4096, 128
N_PREFIX = 2000


def make_inputs():
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda key, h: jax.random.normal(key, (B, S, h, D), jnp.bfloat16)
    return mk(k[0], Hq), mk(k[1], Hkv), mk(k[2], Hkv)


def measure(bq, bk, with_bwd):
    q, k, v = make_inputs()
    mi = MaskInfo(causal=True, prefix_len=jnp.full((B,), N_PREFIX, jnp.int32))

    def one(q):
        out = flash_attention(q, k, v, mi, block_q=bq, block_kv=bk)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f = jax.grad(one) if with_bwd else one

    @functools.partial(jax.jit, static_argnames=("reps",))
    def prog(q, reps):
        def body(c, i):
            qi = q + (i.astype(jnp.bfloat16) * 0)  # loop-dependent, prevents CSE
            r = f(qi)
            r = jnp.sum(r.astype(jnp.float32)) if with_bwd else r
            return c + r, None

        return jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))[0]

    def wall(reps, n=3):
        float(prog(q, reps))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(prog(q, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (wall(50) - wall(5)) / 45


def main():
    # causal fwd flops ~ 4*B*Hq*S^2*D*0.5 (+prefix block extra); bwd ~ 2.5x fwd
    flops_fwd = 4 * B * Hq * S * S * D * 0.5
    for with_bwd in (False, True):
        tag = "fwd+bwd" if with_bwd else "fwd    "
        fl = flops_fwd * (3.5 if with_bwd else 1.0)
        results = []
        for bq in (128, 256):
            for bk in (512, 1024, 2048):
                try:
                    dt = measure(bq, bk, with_bwd)
                    tf = fl / dt / 1e12
                    results.append((dt, (bq, bk)))
                    print(f"  {tag} bq={bq:4d} bk={bk:5d}: {dt*1e6:7.0f} us  (~{tf:5.1f} TFLOP/s)", flush=True)
                except Exception as e:
                    print(f"  {tag} bq={bq:4d} bk={bk:5d}: FAIL {type(e).__name__}", flush=True)
        if results:
            results.sort()
            print(f"BEST {tag}: {results[0][1]} -> {results[0][0]*1e6:.0f} us", flush=True)


if __name__ == "__main__":
    main()
