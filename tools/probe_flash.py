"""Flash-kernel speed-of-light probe on the 8B bench attention shape.

Times, with best-of-k differential runs (chained in-jit reps, N_large - N_small —
CLAUDE.md timing rules), the real fwd / fwd+bwd kernels plus a MATMUL-ONLY probe
kernel (same grid, same blocks, same causal whole-block skip, but no softmax — just
acc += (q@k')@v). The probe bounds what the MXU pipeline alone costs; the gap between
it and the real kernel is the per-block VPU softmax chain (max/exp2/sum/cast) that a
software pipeline could hide.

Usage: python tools/probe_flash.py [--bq 256 --bk 1024] [--sweep]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=24)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--best_of", type=int, default=4)
    ap.add_argument("--bq", type=int, default=256)
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--sweep", action="store_true", help="sweep (bq, bk) grid for fwd+bwd")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from llama_x_tpu.ops import flash_attention as fa
    from llama_x_tpu.ops.attention import MaskInfo

    B, S, Hq, Hkv, D = 1, 4096, 32, 8, 128
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape, np.float32) * 0.3, jnp.bfloat16)
    q, k, v = mk((B, S, Hq, D)), mk((B, S, Hq // 4, D)), mk((B, S, Hkv, D))
    k, v = mk((B, S, Hkv, D)), mk((B, S, Hkv, D))
    ct = mk((B, S, Hq, D))
    mi = MaskInfo(causal=True, prefix_len=jnp.asarray([2000], jnp.int32))

    def timeit(fn, x):
        float(fn(x))  # compile + sync
        best = float("inf")
        for _ in range(args.best_of):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    def diff_time(make_chain):
        tl = timeit(make_chain(args.reps), q)
        ts = timeit(make_chain(args.small), q)
        return (tl - ts) / (args.reps - args.small) * 1e3

    # ---- real kernels through the public entry -------------------------------
    def chain_fwd(bq, bk):
        def make(n):
            def g(q):
                def body(q, _):
                    return (fa.flash_attention(q, k, v, mi, block_q=bq, block_kv=bk), None)
                q, _ = jax.lax.scan(body, q, None, length=n)
                return jnp.sum(q.astype(jnp.float32))
            return jax.jit(g)
        return make

    def chain_bwd(bq, bk):
        def make(n):
            def g(q):
                def body(q, _):
                    def loss(q):
                        return jnp.sum((fa.flash_attention(q, k, v, mi, block_q=bq, block_kv=bk) * ct).astype(jnp.float32))
                    dq = jax.grad(loss)(q)
                    return (q + dq.astype(q.dtype) * jnp.bfloat16(1e-6), None)
                q, _ = jax.lax.scan(body, q, None, length=n)
                return jnp.sum(q.astype(jnp.float32))
            return jax.jit(g)
        return make

    # ---- matmul-only probe (same grid/blocks/causal skip, no softmax) --------
    def probe_kernel(q_ref, k_ref, v_ref, out_ref, acc_ref, *, bq, bk, group, prefix):
        i, j, nk = pl.program_id(2), pl.program_id(3), pl.num_programs(3)
        rows = group * bq

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q_start, kv_start = i * bq, j * bk

        def compute():
            qb = q_ref[0, 0].reshape(rows, -1)
            s = jax.lax.dot_general(qb, k_ref[0, 0], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            pv = jax.lax.dot_general(s.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[:] += pv

        need = (q_start + bq - 1 >= kv_start) | ((q_start < prefix) & (kv_start < prefix))
        pl.when(need)(compute)

        @pl.when(j == nk - 1)
        def _fin():
            out_ref[0, 0] = acc_ref[:].reshape(group, bq, -1).astype(out_ref.dtype)

    def probe(bq, bk):
        group = Hq // Hkv
        nq, nk = S // bq, S // bk

        def one(qt, kt, vt):
            q5 = qt.reshape(B, Hkv, group, S, D)
            out = pl.pallas_call(
                functools.partial(probe_kernel, bq=bq, bk=bk, group=group, prefix=2000),
                grid=(B, Hkv, nq, nk),
                in_specs=[
                    pl.BlockSpec((1, 1, group, bq, D), lambda b, h, i, j: (b, h, 0, i, 0)),
                    pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0)),
                    pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, group, bq, D), lambda b, h, i, j: (b, h, 0, i, 0)),
                out_shape=jax.ShapeDtypeStruct((B, Hkv, group, S, D), qt.dtype),
                scratch_shapes=[pltpu.VMEM((group * bq, D), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
                ),
            )(q5, kt, vt)
            return out.reshape(B, Hq, S, D)

        def make(n):
            def g(qm):
                qt = qm.transpose(0, 2, 1, 3)
                kt = k.transpose(0, 2, 1, 3)
                vt = v.transpose(0, 2, 1, 3)

                def body(qt, _):
                    return (one(qt, kt, vt), None)

                qt, _ = jax.lax.scan(body, qt, None, length=n)
                return jnp.sum(qt.astype(jnp.float32))
            return jax.jit(g)
        return make

    results = {}
    if args.sweep:
        for bq in (128, 256):
            for bk in (512, 1024, 2048):
                t = diff_time(chain_bwd(bq, bk))
                tf = diff_time(chain_fwd(bq, bk))
                results[f"bq{bq}_bk{bk}"] = {"fwd_ms": round(tf, 3), "fwdbwd_ms": round(t, 3)}
                print(f"bq={bq} bk={bk}: fwd {tf:7.3f}  fwd+bwd {t:7.3f} ms", flush=True)
    else:
        bq, bk = args.bq, args.bk
        results["fwd_ms"] = round(diff_time(chain_fwd(bq, bk)), 3)
        print(f"fwd        {results['fwd_ms']:8.3f} ms", flush=True)
        results["fwdbwd_ms"] = round(diff_time(chain_bwd(bq, bk)), 3)
        print(f"fwd+bwd    {results['fwdbwd_ms']:8.3f} ms", flush=True)
        results["probe_matmul_only_ms"] = round(diff_time(probe(bq, bk)), 3)
        print(f"mm-probe   {results['probe_matmul_only_ms']:8.3f} ms", flush=True)

    if args.out:
        from pathlib import Path
        p = Path(args.out)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(results, indent=1))
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
