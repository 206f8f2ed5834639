"""Mixed audio + image + text trainer for the omni early-fusion model (BASELINE
config 5 — the union of the audio and image modalities; no reference counterpart,
its README only plans the modalities separately).

Data comes from a manifest.jsonl (see data/omni.py): every record carries text plus
audio and/or image paths (homogeneous across the manifest). Either modality may be
absent corpus-wide; with both absent this degenerates to text SFT.

Examples:
  # offline smoke (synthetic audio + shapes images + random text, tiny model):
  python train_omni.py --synthetic 64 --n_steps 10 --audio_duration 2 --image_size 32 --patch_size 8

  # real run:
  python train_omni.py --dataset_dir data/omni_corpus --model meta-llama/Meta-Llama-3.1-8B \
      --tokenizer llama3 --quantize int8 --adapter lora --prefix_lm
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.data.tokenizers import get_tokenizer
from llama_x_tpu.models import omni as omni_mod
from llama_x_tpu.models.audio import AudioConfig, LlamaAudio  # noqa: F401 (config reuse)
from llama_x_tpu.models.omni import LlamaOmni
from llama_x_tpu.models.vision import VisionConfig
from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from llama_x_tpu.train.cli import (
    add_common_args,
    assemble_step_batch,
    build_model_params,
    make_save_dir,
    prefetch,
    save_model_config,
    setup_mesh_and_optimizer,
)
from llama_x_tpu.train.metrics import (
    Profiler,
    RunLogger,
    Throughput,
    device_memory_stats,
    step_memory_analysis,
)
from llama_x_tpu.train.trainer import init_train_state, make_train_step


def synthetic_omni_batches(rng, audio_config, micro_bs, audio_duration, image_size, seq_len_multiple, vocab):
    """Synthetic mixed batches: noise audio + shapes canvases + random text."""
    from llama_x_tpu.data.vision import make_shapes_sample

    T = int(audio_duration * audio_config.sample_rate)
    L = seq_len_multiple
    while True:
        images = np.stack([make_shapes_sample(rng, image_size, "train")[0] for _ in range(micro_bs)])
        audio = rng.standard_normal((micro_bs, T)).astype(np.float32) * 0.1
        tokens = rng.integers(1, vocab, (micro_bs, L)).astype(np.int32)
        labels = np.roll(tokens, -1, axis=-1).astype(np.int32)
        labels[:, -1] = -100
        yield {"audio": audio, "images": images, "tokens": tokens, "labels": labels}


def main():
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--dataset_dir")
    parser.add_argument("--audio_duration", type=float, default=40.0)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--patch_size", type=int, default=14)
    parser.add_argument("--seq_len_multiple", type=int, default=128)
    parser.add_argument("--max_text_len", type=int, default=1024)
    parser.add_argument("--prefix_lm", action="store_true", help="bidirectional attention over all modality tokens")
    args = parser.parse_args()

    assert args.synthetic or args.dataset_dir, "--dataset_dir required (or --synthetic)"

    audio_config = AudioConfig()
    vision_config = VisionConfig(image_size=args.image_size, patch_size=args.patch_size)
    # sequence budget: audio tokens (50/s) + image tokens + text
    n_audio_tokens = audio_config.num_audio_tokens(int(args.audio_duration * audio_config.sample_rate))
    max_seq_len = n_audio_tokens + vision_config.num_image_tokens() + args.max_text_len

    from llama_x_tpu.train.cli import setup_mesh
    from llama_x_tpu.train.validate import validate_launch, validate_model

    mesh = setup_mesh(args)
    validate_launch(args, mesh, modality="omni", max_seq_len=max_seq_len)
    model, params, config, mask = build_model_params(
        args, LlamaOmni, mesh=mesh,
        init_kwargs=dict(audio_config=audio_config, vision_config=vision_config),
        hf_kwargs=dict(image_size=args.image_size, patch_size=args.patch_size),
        max_seq_len=max_seq_len,
    )
    validate_model(config, mesh, args, modality="omni")
    mesh, params, tx, schedule = setup_mesh_and_optimizer(args, params, mesh)

    micro_bs = args.batch_size // args.gradient_accumulation
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        data_iter = synthetic_omni_batches(
            rng, audio_config, micro_bs, args.audio_duration, args.image_size,
            args.seq_len_multiple, config.vocab_size,
        )
        has_audio = has_image = True
    else:
        from llama_x_tpu.data.omni import OmniManifest

        tokenizer = get_tokenizer(args.tokenizer, args.tokenizer_path)
        ds = OmniManifest(
            args.dataset_dir,
            tokenizer,
            audio_duration=args.audio_duration,
            image_size=args.image_size,
            seq_len_multiple=args.seq_len_multiple,
            batch_size=micro_bs,
            sample_rate=audio_config.sample_rate,
            max_text_len=args.max_text_len,
            seed=args.seed,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
        )
        has_audio, has_image = ds.has_audio, ds.has_image
        print(f"Training dataset size: {len(ds.records):,} (audio={has_audio}, image={has_image})")
        data_iter = prefetch(iter(ds), depth=4)

    pp = mesh.shape.get("pp", 1)
    if pp > 1:
        # pipeline-parallel omni: both stems run outside the pipeline; their token
        # streams concatenate (audio first, then image — omni.forward's order) into
        # the single prefix injected at stage 0
        from llama_x_tpu.models.audio import audio_embed
        from llama_x_tpu.models.vision import patch_embed
        from llama_x_tpu.parallel.pipeline import pipeline_loss
        from llama_x_tpu.train.cli import pp_microbatch_count

        n_micro = pp_microbatch_count(args, mesh, micro_bs)

        def loss_fn(p, mb):
            dtype = p["tok_embeddings"]["weight"].dtype
            prefixes = []
            if "audio" in mb:
                prefixes.append(audio_embed(p["audio_embed"], audio_config, mb["audio"], dtype=dtype))
            if "images" in mb:
                prefixes.append(patch_embed(p["patch_embed"], vision_config, mb["images"], dtype=dtype))
            prefix = jnp.concatenate(prefixes, axis=1) if prefixes else None
            loss = pipeline_loss(
                p, config, mb["tokens"], mb["labels"], mesh, n_micro,
                prefix_embeds=prefix, prefix_lm=args.prefix_lm,
            )
            return loss, jnp.sum(mb["labels"] != -100)

    else:

        def loss_fn(p, mb):
            loss = omni_mod.forward(
                p, config, audio_config, vision_config,
                mb.get("audio"), mb.get("images"), mb["tokens"],
                labels=mb["labels"], prefix_lm=args.prefix_lm,
            )
            return loss, jnp.sum(mb["labels"] != -100)

    state = init_train_state(params, mask, tx)
    train_step = jax.jit(make_train_step(loss_fn, tx, skip_nonfinite=args.skip_nonfinite), donate_argnums=(0,))

    step = 0
    if args.resume:
        path = latest_checkpoint(args.resume) or args.resume
        state = restore_checkpoint(path, state)
        step = int(state["step"])
        print(f"resumed from {path} at step {step}")

    save_dir = make_save_dir("omni", args.run_name)
    save_model_config(save_dir, config, audio_config=audio_config, vision_config=vision_config)
    logger = RunLogger(save_dir, config=vars(args), project=args.project, run_name=args.run_name)
    meter = Throughput()
    profiler = Profiler(str(save_dir / "profile")) if args.profile else None

    def step_batches():
        while True:
            micro = [next(data_iter) for _ in range(args.gradient_accumulation)]
            yield assemble_step_batch(micro, mesh, pad_values={"labels": -100})

    batch_iter = prefetch(step_batches(), depth=2)

    from llama_x_tpu.parallel import use_mesh

    tok_acc, audio_acc = None, 0.0
    mem_fallback = None
    with use_mesh(mesh):
        while step < args.n_steps:
            batch = next(batch_iter)
            state, metrics = train_step(state, batch)
            tok_acc = metrics["n_tokens"] if tok_acc is None else tok_acc + metrics["n_tokens"]
            if has_audio:
                audio_acc += args.audio_duration * args.batch_size

            if step % args.log_interval == 0:
                meter.update(int(tok_acc), audio_secs=audio_acc)
                tok_acc, audio_acc = None, 0.0
                mem = device_memory_stats()
                if not mem:
                    if mem_fallback is None:
                        mem_fallback = step_memory_analysis(train_step, state, batch)
                    mem = mem_fallback
                log = {
                    "loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "lr": float(schedule(step)),
                    **mem,
                }
                if step > 0:
                    log.update(meter.rates())
                logger.log(log, step)
                print(f"step {step}: loss {log['loss']:.4f}")

            step += 1
            if args.ckpt_interval > 0 and step % args.ckpt_interval == 0:
                save_checkpoint(save_dir, state, step)
            if profiler is not None:
                profiler.step(step)

    if profiler is not None:
        profiler.close()
    save_checkpoint(save_dir, state, step)
    logger.finish()


if __name__ == "__main__":
    main()
