"""Export a training-run checkpoint as a HuggingFace Llama model.

Ties the trainer's checkpoint surface (train/checkpoint.py TrainState) to
models/hf.py:save_llama_hf: restores the latest (or given) step, merges
trainable+frozen back into model params, dequantizes any int8 base, merges
LoRA/DoRA adapters, and writes config.json + model.safetensors loadable by
``transformers`` — the "fine-tune here, serve anywhere" path the reference
lacks entirely (it torch.saves raw state dicts).

Multimodal runs: the audio/vision stems have no HF-Llama representation; the text
trunk is exported and the stem leaves are skipped with a notice (keep the run dir
if you need them — eval_librispeech.py consumes the native checkpoint directly).

usage:
  python tools/export_checkpoint.py runs/metamathqa/<run> out_dir/
  python tools/export_checkpoint.py runs/librispeech/<run>/step_00001000 out_dir/ --dtype float16
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_or_ckpt", help="run dir (uses latest step) or a step_NNNNNNNN dir")
    parser.add_argument("out_dir")
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32", "float16"])
    args = parser.parse_args()

    from llama_x_tpu.models.hf import save_llama_hf
    from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_params
    from llama_x_tpu.train.cli import load_model_config

    run_dir = Path(args.run_or_ckpt)
    path = latest_checkpoint(run_dir) or run_dir
    saved = load_model_config(run_dir) or load_model_config(run_dir.parent)
    assert saved is not None, f"no model_config.json found near {run_dir}"
    config = saved[0]

    params, step = restore_params(path)
    params = jax.tree.map(jnp.asarray, params)
    dropped = [k for k in ("audio_embed", "vision_embed") if k in params]
    for k in dropped:
        params.pop(k)
    if dropped:
        print(f"note: skipped non-HF modality stems {dropped} (native checkpoint keeps them)")

    out = save_llama_hf(params, config, args.out_dir, dtype=getattr(jnp, args.dtype))
    print(f"exported step-{step} params -> {out} (config.json + model.safetensors)")


if __name__ == "__main__":
    main()
