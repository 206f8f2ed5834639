"""Shared trainer plumbing for the CLI entry points (train_metamathqa.py,
train_librispeech.py): model construction + freeze/quantize/adapt composition
(≡ train_metamathqa.py:172-186), mesh/sharding setup, step-batch assembly, and the
common argparse flags (≡ train_metamathqa.py:131-163, train_librispeech.py:128-159)."""

from __future__ import annotations

import argparse
import json
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.adapters import apply_linear_adapter, quantize_linear, trainable_mask
from llama_x_tpu.parallel import batch_sharding, make_mesh, shard_params
from llama_x_tpu.train.optim import get_optimizer, trapezoid_schedule
from llama_x_tpu.utils.tree import trainable_param_count


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--model", default="TinyLlama/TinyLlama_v1.1")
    parser.add_argument("--tokenizer", default="llama2")
    parser.add_argument("--tokenizer_path", help="local tokenizer.model (offline)")
    parser.add_argument("--adapter", choices=["lora", "dora"])
    parser.add_argument("--adapter_kwargs", type=json.loads, default=dict())
    parser.add_argument("--quantize", choices=["int8"])
    parser.add_argument("--quantize_kwargs", type=json.loads, default=dict())
    parser.add_argument("--freeze_prefixes", nargs="+", default=[])
    parser.add_argument("--activation_checkpointing", action="store_true")

    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--n_steps", type=int, default=1000)
    parser.add_argument("--gradient_accumulation", type=int, default=1)

    parser.add_argument("--optim", default="AdamW", choices=["AdamW", "AdamW8bit", "AdamW4bit"])
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--warmup", type=float, default=0.0)
    parser.add_argument("--decay", type=float, default=0.0)
    parser.add_argument("--clip_grad_norm", type=float)

    parser.add_argument("--ckpt_interval", type=int, default=1000)
    parser.add_argument("--log_interval", type=int, default=50)
    parser.add_argument("--project")
    parser.add_argument("--run_name")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip_nonfinite", action="store_true", help="suppress updates on NaN/Inf grads")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--resume")

    # --- TPU-native knobs (no reference counterpart) ---
    parser.add_argument("--mesh", type=json.loads, default=dict(), help='e.g. {"dp":4,"fsdp":2,"tp":2}')
    parser.add_argument(
        "--pp_microbatches", type=int, default=0,
        help="GPipe microbatches per step when the mesh has a pp axis (0 = pp size)",
    )
    parser.add_argument("--attn_impl", default="auto", choices=["auto", "xla", "flash", "ring", "ulysses"])
    parser.add_argument("--remat_policy", default="full", choices=[
        "full", "dots", "dots_flash", "flash", "flash_qkv", "flash_proj",
        "flash_q8", "flash_q8s", "flash_qkv_q8", "flash_qkv_q8s",
        "flash_proj_q8", "flash_proj_q8s", "attn_q8", "attn_q8s",
    ])
    parser.add_argument("--fused_ce_chunks", type=int, default=0)
    parser.add_argument(
        "--synthetic", type=int, default=0,
        help="train on N synthetic samples with the byte tokenizer + a tiny random model (offline smoke)",
    )
    parser.add_argument(
        "--synthetic_task", default="random", choices=["random", "count"],
        help="random: unlearnable smoke tokens; count: learnable counting sequences "
        "(data/synthetic.py — the speculative draft/target pair trains on this)",
    )
    parser.add_argument(
        "--synthetic_config", type=json.loads, default=dict(),
        help='tiny_config geometry overrides for --synthetic, e.g. \'{"num_layers":8,"embed_dim":512}\'',
    )


def make_save_dir(task: str, run_name: str | None) -> Path:
    name = f"{run_name or 'run'}_{datetime.now().strftime('%Y%m%d_%H%M%S')}"
    d = Path("runs") / task / name
    d.mkdir(parents=True, exist_ok=True)
    return d


def save_model_config(save_dir: Path, config, audio_config=None, vision_config=None):
    """Persist the model hyperparameters next to the checkpoints so eval scripts can
    rebuild the exact architecture without re-deriving it from CLI args or HF
    (eval_librispeech.py / eval_vision.py --resume read this)."""
    import dataclasses

    rec = {"llama": dataclasses.asdict(config)}
    if audio_config is not None:
        rec["audio"] = dataclasses.asdict(audio_config)
    if vision_config is not None:
        rec["vision"] = dataclasses.asdict(vision_config)
    (Path(save_dir) / "model_config.json").write_text(json.dumps(rec, indent=2))


def load_model_config(run_dir: Path):
    """(LlamaConfig, AudioConfig | None) from a run dir's model_config.json, or None.
    Use load_model_configs for the full (llama, audio, vision) record."""
    full = load_model_configs(run_dir)
    if full is None:
        return None
    return full[0], full[1]


def load_model_configs(run_dir: Path):
    """(LlamaConfig, AudioConfig | None, VisionConfig | None) or None."""
    from llama_x_tpu.models.audio import AudioConfig
    from llama_x_tpu.models.llama import LlamaConfig
    from llama_x_tpu.models.vision import VisionConfig

    p = Path(run_dir) / "model_config.json"
    if not p.exists():
        return None
    rec = json.loads(p.read_text())
    llama_config = LlamaConfig(**rec["llama"])
    audio_config = AudioConfig(**rec["audio"]) if "audio" in rec else None
    vision_config = VisionConfig(**rec["vision"]) if "vision" in rec else None
    return llama_config, audio_config, vision_config


def prefetch(it, depth: int = 2):
    """Background-thread prefetcher: batch assembly + host→device transfer overlap the
    running step (replaces the reference's DataLoader worker processes,
    train_librispeech.py:192). Wrap the FULL step-batch pipeline (assembly +
    device_put), not just the raw iterator — device_put through the relay is the
    expensive part worth hiding."""
    import queue as queue_mod
    import threading

    q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
    _END = object()

    def worker():
        # exceptions cross the thread boundary and re-raise in the consumer — a bare
        # sentinel here would turn a data-pipeline failure into a silent end-of-data
        # (the training loop would die with an unrelated StopIteration)
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def build_model_params(args, model_cls, mesh=None, init_kwargs=None, hf_kwargs=None, **extra_config):
    """from_hf (or tiny synthetic init) → freeze → quantize → adapt
    (composition order ≡ train_metamathqa.py:172-186).

    With ``mesh``, HF weights stream straight onto their mesh shardings as they load
    (models/hf.py) — no replicated whole-model stopover. ``init_kwargs`` go to
    model_cls.init (e.g. vision_config=...), ``hf_kwargs`` to model_cls.from_hf (e.g.
    image_size=...) — modality stems configure differently on the two paths."""
    from llama_x_tpu.models import llama as llama_mod

    config_overrides = dict(
        activation_checkpointing=args.activation_checkpointing,
        attn_impl=args.attn_impl,
        fused_ce_chunks=args.fused_ce_chunks,
        remat_policy=args.remat_policy,
        **extra_config,
    )

    if args.synthetic:
        geo = dict(
            embed_dim=256, num_layers=4, head_dim=32, num_heads=8, num_kv_heads=4,
            intermediate_dim=512, vocab_size=512,
        )
        geo.update(getattr(args, "synthetic_config", None) or {})
        config = llama_mod.tiny_config(
            **geo, max_seq_len=extra_config.get("max_seq_len", 2048),
        ).replace(**{k: v for k, v in config_overrides.items() if k != "max_seq_len"})
        model = model_cls.init(jax.random.PRNGKey(args.seed), config, dtype=jnp.bfloat16, **(init_kwargs or {}))
    else:
        model = model_cls.from_hf(
            args.model, dtype=jnp.bfloat16, mesh=mesh, **config_overrides, **(hf_kwargs or {})
        )

    params, config = model.params, model.config

    if args.quantize:
        dynamic = bool(args.quantize_kwargs.get("dynamic_int8_act", False))
        dynamic_bwd = bool(args.quantize_kwargs.get("dynamic_int8_bwd", False))
        # int8 fused-CE head (quality: runs/int8_head_quality) — only engages when the
        # mask-derived frozen_head below is also true
        int8_head = bool(args.quantize_kwargs.get("int8_head", False))
        params = dict(params, layers=quantize_linear(params["layers"], args.quantize))
        config = config.replace(
            dynamic_int8_act=dynamic, dynamic_int8_bwd=dynamic_bwd, int8_head=int8_head
        )
    if args.adapter:
        params = dict(
            params,
            layers=apply_linear_adapter(
                params["layers"], args.adapter, jax.random.PRNGKey(args.seed + 1), **args.adapter_kwargs
            ),
        )

    mask = trainable_mask(params, tuple(args.freeze_prefixes))
    # derive frozen_head from the ACTUAL mask (not the flag list) so the fused-CE
    # backward skips the dK GEMM + [D, V] fp32 accumulator exactly when the optimizer
    # would discard them anyway — by construction they can never disagree
    head_trainable = (
        mask["tok_embeddings"]["weight"]
        if config.tied_embeddings
        else mask.get("output", {}).get("kernel", True)
    )
    config = config.replace(frozen_head=not head_trainable)
    n_train, n_frozen = trainable_param_count(params, mask)
    print(f"No. of trainable params: {n_train:,}")
    print(f"No. of non-trainable params: {n_frozen:,}")
    return model, params, config, mask


def pp_microbatch_count(args, mesh, micro_bs: int) -> int:
    """GPipe microbatches for the pp trainer path: --pp_microbatches, else the pp size
    (falling back to gcd when the local batch doesn't divide). Shared by every trainer
    with a pp mode."""
    import math

    pp = mesh.shape.get("pp", 1)
    dp_size = mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1)
    local_bs = micro_bs // dp_size
    n_micro = args.pp_microbatches or (pp if local_bs % pp == 0 else math.gcd(local_bs, pp))
    assert local_bs % n_micro == 0, (
        f"local batch {local_bs} (batch {micro_bs} / data-parallel {dp_size}) must "
        f"divide into --pp_microbatches {n_micro}"
    )
    if n_micro < pp:
        print(f"warning: {n_micro} pipeline microbatches < {pp} stages — large bubble")
    return n_micro


def setup_mesh(args):
    # single funnel for every trainer: turn the persistent compilation cache on before
    # the first jit (the 8B step compiles for ~10 min cold on the tunneled backend;
    # warm starts load from disk instead — utils/cache.py)
    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()
    return make_mesh(**args.mesh) if args.mesh else make_mesh(dp=len(jax.devices()))


def setup_mesh_and_optimizer(args, params, mesh=None):
    mesh = mesh if mesh is not None else setup_mesh(args)
    # idempotent for leaves from_hf already placed; places the quantize/adapter leaves
    params = shard_params(params, mesh)
    schedule = trapezoid_schedule(args.lr, args.n_steps, args.warmup, args.decay)
    tx = get_optimizer(args.optim, schedule, args.weight_decay, args.clip_grad_norm)
    return mesh, params, tx, schedule


def assemble_step_batch(micro_batches: list[dict], mesh=None, pad_values: dict | None = None) -> dict:
    """Stack accumulation microbatches into [accum, mb, ...], padding ragged sequence
    lengths up to the step max (bucketed padding mode yields a few distinct lengths)."""
    pad_values = pad_values or {}
    keys = micro_batches[0].keys()
    out = {}
    for k in keys:
        arrs = [mb[k] for mb in micro_batches]
        max_len = max(a.shape[-1] for a in arrs)
        pv = pad_values.get(k, 0)
        arrs = [
            np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, max_len - a.shape[-1])], constant_values=pv)
            if a.shape[-1] != max_len
            else a
            for a in arrs
        ]
        stacked = np.stack(arrs)
        if mesh is not None:
            stacked = jax.device_put(stacked, batch_sharding(mesh))
        out[k] = stacked
    return out
