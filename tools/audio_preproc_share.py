"""BASELINE sub-target artifact: audio preprocessing share of the 8B training step.

BASELINE.md targets "audio preprocessing overhead < 5% of step time (overlapped)".
In this framework the mel frontend + conv stem run INSIDE the jitted step (the mel is
an MXU DFT-conv, ops/audio_frontend.py), so "overlap" is XLA's own scheduling — this
tool measures what the preprocessing actually costs next to bench.py's step.

Method: differential timing (CLAUDE.md — every synced dispatch through the tunnel
carries ~30 ms, so single-dispatch timing lies). The stem forward (mel + 2x conv) at
bench shapes is chained in-jit N_large and N_small times; (t_large - t_small) /
(N_large - N_small) is the per-call device time. The backward never runs it: the
audio stem is frozen in the QLoRA mask and audio needs no input grads, so XLA DCEs
the stem's backward (the share is a forward-only cost by construction).

Artifact: runs/bench_omni/audio_preproc.json with the share vs the measured step.
usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/audio_preproc_share.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--step_ms", type=float, default=0.0,
                        help="known 8B step time; 0 = use bench.py's last artifact value 946")
    parser.add_argument("--audio_secs", type=float, default=40.0)
    parser.add_argument("--reps", type=int, default=24)
    parser.add_argument("--out", default="runs/bench_omni/audio_preproc.json")
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from llama_x_tpu.models import llama
    from llama_x_tpu.models.audio import AudioConfig, audio_embed, init_audio_stem

    config = llama.LlamaConfig(
        embed_dim=4096, num_layers=32, head_dim=128, num_heads=32, num_kv_heads=8,
        intermediate_dim=14336, max_seq_len=4096, vocab_size=128_256,
    )
    audio_config = AudioConfig()
    stem = init_audio_stem(jax.random.PRNGKey(0), config, audio_config, jnp.bfloat16)
    n_samp = int(args.audio_secs * audio_config.sample_rate)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, n_samp)).astype(np.float32) * 0.1)

    def reps(n):
        @jax.jit
        def f(a):
            out = jnp.zeros((), jnp.float32)
            x = a
            for i in range(n):
                # perturb the input per rep so XLA cannot CSE the chain into one call
                e = audio_embed(stem, audio_config, x, dtype=jnp.bfloat16)
                out = out + jnp.sum(e.astype(jnp.float32))
                x = a + out * 1e-20
            return out

        return f

    def timed(f, a):
        float(f(a))  # compile + sync (block_until_ready is a no-op on the tunnel)
        t0 = time.perf_counter()
        float(f(a))
        return time.perf_counter() - t0

    n_small, n_large = 4, 4 + args.reps
    t_small = timed(reps(n_small), audio)
    t_large = timed(reps(n_large), audio)
    per_call_ms = (t_large - t_small) / args.reps * 1e3
    step_ms = args.step_ms or 946.0
    share = per_call_ms / step_ms
    n_tok = audio_config.num_audio_tokens(n_samp)

    print(f"mel+stem fwd ({args.audio_secs:.0f}s audio -> {n_tok} tokens): "
          f"{per_call_ms:.2f} ms/call = {share * 100:.2f}% of the {step_ms:.0f} ms step")
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({
        "audio_secs": args.audio_secs,
        "audio_tokens": int(n_tok),
        "mel_stem_fwd_ms": round(per_call_ms, 3),
        "step_ms": step_ms,
        "share_of_step": round(share, 5),
        "target": "< 0.05 (BASELINE.md)",
        "pass": bool(share < 0.05),
        "method": f"differential in-jit chain ({n_large}-{n_small} reps); backward is "
                  "DCE'd (frozen stem, no audio input grads)",
    }, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
