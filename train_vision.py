"""Image-captioning / VQA-style SFT trainer for the Fuyu-style image modality
(BASELINE config 3 — the reference README's planned "images" path, README.md:14,
never implemented there; the trainer mirrors train_librispeech.py's structure).

Examples:
  # offline smoke (synthetic colored-shapes task, byte tokenizer, tiny model):
  python train_vision.py --synthetic 64 --n_steps 10 --image_size 32 --patch_size 8

  # real run (directory of images + captions.jsonl manifest):
  python train_vision.py --dataset_dir data/coco_captions \
      --model meta-llama/Meta-Llama-3.1-8B --tokenizer llama3 \
      --quantize int8 --adapter lora --prefix_lm
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.data.tokenizers import get_tokenizer
from llama_x_tpu.data.vision import ImageCaptions, synthetic_shapes_batches
from llama_x_tpu.models import vision as vision_mod
from llama_x_tpu.models.vision import LlamaVision, VisionConfig
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


def main():
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--dataset_dir")
    parser.add_argument("--image_size", type=int, default=224, help="static square canvas")
    parser.add_argument("--patch_size", type=int, default=14)
    parser.add_argument("--seq_len_multiple", type=int, default=32)
    parser.add_argument("--max_text_len", type=int, default=512)
    parser.add_argument("--prefix_lm", action="store_true", help="bidirectional attention over the image tokens")
    args = parser.parse_args()

    assert args.synthetic or args.dataset_dir, "--dataset_dir required (or --synthetic)"

    vision_config = VisionConfig(image_size=args.image_size, patch_size=args.patch_size)
    # image tokens + text budget: e.g. 224/14 -> 256 patches + 16 newlines = 272
    max_seq_len = vision_config.num_image_tokens() + args.max_text_len

    from llama_x_tpu.train.cli import setup_mesh
    from llama_x_tpu.train.validate import validate_launch, validate_model

    mesh = setup_mesh(args)
    validate_launch(args, mesh, modality="vision", max_seq_len=max_seq_len)
    model, params, config, mask = build_model_params(
        args, LlamaVision, mesh=mesh,
        init_kwargs=dict(vision_config=vision_config),
        hf_kwargs=dict(image_size=args.image_size, patch_size=args.patch_size),
        max_seq_len=max_seq_len,
    )
    validate_model(config, mesh, args, modality="vision")
    mesh, params, tx, schedule = setup_mesh_and_optimizer(args, params, mesh)

    micro_bs = args.batch_size // args.gradient_accumulation
    if args.synthetic:
        tokenizer = get_tokenizer("byte")
        rng = np.random.default_rng(args.seed)
        data_iter = synthetic_shapes_batches(
            rng, tokenizer, micro_bs, args.image_size, args.seq_len_multiple
        )
    else:
        tokenizer = get_tokenizer(args.tokenizer, args.tokenizer_path)
        ds = ImageCaptions(
            args.dataset_dir,
            tokenizer,
            image_size=args.image_size,
            seq_len_multiple=args.seq_len_multiple,
            batch_size=micro_bs,
            max_text_len=args.max_text_len,
            seed=args.seed,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
        )
        print(f"Training dataset size: {len(ds.samples):,}")
        data_iter = prefetch(iter(ds), depth=4)

    pp = mesh.shape.get("pp", 1)
    if pp > 1:
        # pipeline-parallel vision: the patch-embed stem runs outside the pipeline,
        # its image tokens are injected at stage 0 (parallel/pipeline.py prefix path)
        from llama_x_tpu.parallel.pipeline import pipeline_loss
        from llama_x_tpu.train.cli import pp_microbatch_count

        n_micro = pp_microbatch_count(args, mesh, micro_bs)

        def loss_fn(p, mb):
            prefix = vision_mod.patch_embed(
                p["patch_embed"], vision_config, mb["images"],
                dtype=p["tok_embeddings"]["weight"].dtype,
            )
            loss = pipeline_loss(
                p, config, mb["tokens"], mb["labels"], mesh, n_micro,
                prefix_embeds=prefix, prefix_lm=args.prefix_lm,
            )
            return loss, jnp.sum(mb["labels"] != -100)

    else:

        def loss_fn(p, mb):
            loss = vision_mod.forward(
                p, config, vision_config, mb["images"], mb["tokens"],
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

    save_dir = make_save_dir("vision", args.run_name)
    save_model_config(save_dir, config, vision_config=vision_config)
    logger = RunLogger(save_dir, config=vars(args), project=args.project, run_name=args.run_name)
    meter = Throughput()
    profiler = Profiler(str(save_dir / "profile")) if args.profile else None

    def step_batches():
        while True:
            micro = [next(data_iter) for _ in range(args.gradient_accumulation)]
            yield assemble_step_batch(micro, mesh, pad_values={"labels": -100})

    batch_iter = prefetch(step_batches(), depth=2)

    from llama_x_tpu.parallel import use_mesh

    tok_acc = None
    mem_fallback = None
    with use_mesh(mesh):
        while step < args.n_steps:
            batch = next(batch_iter)
            state, metrics = train_step(state, batch)
            tok_acc = metrics["n_tokens"] if tok_acc is None else tok_acc + metrics["n_tokens"]

            if step % args.log_interval == 0:
                meter.update(int(tok_acc))
                tok_acc = None
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
