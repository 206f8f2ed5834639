"""Real-TPU parity drive for the Pallas decode kernel (CPU tests run it in interpret
mode; this checks the compiled Mosaic kernel on hardware — reference behavior:
modelling/llama.py:126-137's SDPA-over-full-cache is the semantic oracle here too).

Covers every routed form: Sq in {1, 2, 5, 8} (plain decode, the speculative draft
pair step, verify passes), bf16 and rowwise-int8 cache sides, per-row and per-query
(staircase) windows. Writes runs/bench_decode/tpu_parity.json.

usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/tpu_decode_parity.py
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from llama_x_tpu.models import llama
    from llama_x_tpu.ops import decode_attention as da
    from llama_x_tpu.ops.attention import MaskInfo, dot_product_attention

    assert jax.default_backend() == "tpu", jax.default_backend()

    rng = np.random.default_rng(0)
    B, S_max, Hq, Hkv, D = 4, 2048, 8, 4, 128
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = mk((B, Hkv, S_max, D))
    v = mk((B, Hkv, S_max, D))
    k_i8, k_s = llama.quantize_kv_rows(k)
    v_i8, v_s = llama.quantize_kv_rows(v)
    kd = llama.dequant_kv((k_i8, k_s)).astype(jnp.float32)
    vd = llama.dequant_kv((v_i8, v_s)).astype(jnp.float32)
    scale = 1.0 / D**0.5

    rows = []
    ok = True
    for sq in (1, 2, 5, 8):
        q = mk((B, sq, Hq, D))
        # per-query staircase: row base positions then +1 per query (verify pass)
        base = jnp.asarray(rng.integers(sq, S_max, B), jnp.int32)
        pos = base[:, None] + jnp.arange(sq, dtype=jnp.int32)[None, :]
        mi = MaskInfo(causal=True, q_positions=pos, kv_len=base + sq)
        assert da.decode_supported(q.shape, k.shape, mi), (sq, "not routed")
        lens = da.effective_lens(mi, B, sq)

        for name, kernel, kk, vv in (
            ("bf16", lambda: da.decode_attention(q, k, v, lens, scale), k, v),
            ("int8", lambda: da.decode_attention_int8(q, k_i8, k_s, v_i8, v_s, lens, scale), kd, vd),
        ):
            got = np.asarray(kernel())
            want = np.asarray(dot_product_attention(
                q, kk.transpose(0, 2, 1, 3), vv.transpose(0, 2, 1, 3), mi))
            err = float(np.max(np.abs(got - want)))
            rows.append({"sq": sq, "cache": name, "max_abs_err": err})
            tol = 2e-2 if name == "int8" else 5e-3  # bf16 MXU accumulation vs f32 oracle
            good = err <= tol
            ok &= good
            print(f"Sq={sq} {name}: max_abs_err {err:.2e} {'ok' if good else 'FAIL'}",
                  flush=True)

    out = {"backend": "tpu", "geometry": dict(B=B, S_max=S_max, Hq=Hq, Hkv=Hkv, D=D),
           "rows": rows, "ok": ok}
    path = Path("runs/bench_decode/tpu_parity.json")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"ok": ok, "artifact": str(path)}))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
