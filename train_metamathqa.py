"""Text-only SFT trainer on MetaMathQA (≡ reference train_metamathqa.py CLI, rebuilt
around a single jitted data-parallel train step on a TPU mesh).

Examples:
  # offline smoke (tiny random model, synthetic data, byte tokenizer):
  python train_metamathqa.py --synthetic 512 --n_steps 20 --batch_size 8 --document_mask

  # real run:
  python train_metamathqa.py --model TinyLlama/TinyLlama_v1.1 --tokenizer llama2 \
      --adapter lora --quantize int8 --document_mask --n_steps 1000
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.data.metamathqa import get_metamathqa
from llama_x_tpu.models import llama
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
    parser.add_argument("--document_mask", action="store_true")
    parser.add_argument("--max_seq_len", type=int, default=1024)
    parser.add_argument("--seq_len_multiple", type=int, default=256)
    args = parser.parse_args()

    if args.profile:
        args.n_steps = min(args.n_steps, 10)

    from llama_x_tpu.train.cli import setup_mesh
    from llama_x_tpu.train.validate import validate_launch, validate_model

    mesh = setup_mesh(args)
    validate_launch(args, mesh, max_seq_len=args.max_seq_len)
    model, params, config, mask = build_model_params(
        args, llama.Llama, mesh=mesh, max_seq_len=args.max_seq_len
    )
    validate_model(config, mesh, args)
    mesh, params, tx, schedule = setup_mesh_and_optimizer(args, params, mesh)

    micro_bs = args.batch_size // args.gradient_accumulation
    if args.synthetic:
        if args.synthetic_task == "count":
            # learnable counting sequences (deterministic continuations) — the
            # trained speculative draft/target pair comes from this task
            from llama_x_tpu.data.synthetic import counting_tokens
            from llama_x_tpu.data.tokenizers import get_tokenizer

            tokens_list = counting_tokens(
                args.synthetic, args.seed, args.max_seq_len // 2, get_tokenizer("byte", None)
            )
        else:
            rng = np.random.default_rng(args.seed)
            tokens_list = [
                rng.integers(1, config.vocab_size, rng.integers(16, args.max_seq_len // 2)).astype(np.int32)
                for _ in range(args.synthetic)
            ]
        data_iter, train_size = get_metamathqa(
            "byte", args.document_mask, micro_bs, args.max_seq_len, args.seq_len_multiple,
            tokens_list=tokens_list, seed=args.seed,
        )
    else:
        data_iter, train_size = get_metamathqa(
            args.tokenizer, args.document_mask, micro_bs, args.max_seq_len, args.seq_len_multiple,
            seed=args.seed, num_shards=jax.process_count(), shard_index=jax.process_index(),
        )
    print(f"Training dataset size: {train_size:,}")

    pp = mesh.shape.get("pp", 1)
    if pp > 1:
        # pipeline parallelism: the loss is GPipe-scheduled over the pp mesh axis
        # (parallel/pipeline.py) — to the trainer it is just another loss_fn, so
        # accumulation/clip/optimizer/donation all come from the same make_train_step
        from llama_x_tpu.parallel.pipeline import pipeline_loss
        from llama_x_tpu.train.cli import pp_microbatch_count

        n_micro = pp_microbatch_count(args, mesh, micro_bs)

        def loss_fn(p, mb):
            loss = pipeline_loss(
                p, config, mb["inputs"], mb["labels"], mesh, n_micro,
                segment_ids=mb.get("segment_ids"),
            )
            return loss, jnp.sum(mb["labels"] != -100)

    else:

        def loss_fn(p, mb):
            loss = llama.forward(
                p, config, mb["inputs"], segment_ids=mb.get("segment_ids"), labels=mb["labels"]
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

    save_dir = make_save_dir("metamathqa", args.run_name)
    save_model_config(save_dir, config)
    logger = RunLogger(save_dir, config=vars(args), project=args.project, run_name=args.run_name)
    meter = Throughput()
    profiler = Profiler(str(save_dir / "profile")) if args.profile else None

    def step_batches():
        while True:
            micro = [next(data_iter) for _ in range(args.gradient_accumulation)]
            yield assemble_step_batch(micro, mesh, pad_values={"labels": -100})

    batch_iter = prefetch(step_batches(), depth=2)

    # the ambient mesh makes shard_map-based paths (ring attention over a cp axis)
    # reachable from inside the jitted step — the trace happens on the first call
    from llama_x_tpu.parallel import use_mesh

    # token count accumulates ON DEVICE between log points — int()-ing it every step
    # would force a device→host readback per step and serialize dispatch against the
    # step (the relay transfer is slow; measured as a real per-step cost)
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
                    # backend exposes no live stats (tunneled TPU): log the compiler's
                    # one-time estimate instead of 0.0 lies, or nothing at all
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
