"""LibriSpeech ASR fine-tuning trainer (≡ reference train_librispeech.py CLI): packed
audio windows → early-fusion LlamaAudio → jitted data-parallel step on a TPU mesh.

Download LibriSpeech from https://www.openslr.org/12 (flac decoding needs soundfile;
.wav works out of the box).

Examples:
  # offline smoke (synthetic sine-wave 'utterances', byte tokenizer, tiny model):
  python train_librispeech.py --synthetic 64 --n_steps 10 --audio_duration 4

  # real run:
  python train_librispeech.py --dataset_dir LibriSpeech/train-clean-100 \
      --model meta-llama/Meta-Llama-3.1-8B --tokenizer llama3 --adapter lora --prefix_lm
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.data.librispeech import LibriSpeechPacked
from llama_x_tpu.data.tokenizers import get_tokenizer
from llama_x_tpu.models import audio as audio_mod
from llama_x_tpu.models.audio import AudioConfig, LlamaAudio
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


def synthetic_audio_batches(rng, audio_config, micro_bs, audio_duration, seq_len_multiple, vocab):
    """Synthetic packed windows for offline smoke runs."""
    T = int(audio_duration * audio_config.sample_rate)
    L = seq_len_multiple
    while True:
        audio = rng.standard_normal((micro_bs, T)).astype(np.float32) * 0.1
        tokens = rng.integers(1, vocab, (micro_bs, L)).astype(np.int32)
        labels = np.roll(tokens, -1, axis=-1).astype(np.int32)
        labels[:, -1] = -100
        yield {"audio": audio, "tokens": tokens, "labels": labels}


def main():
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--dataset_dir")
    parser.add_argument("--audio_duration", type=float, default=40.0)
    parser.add_argument("--seq_len_multiple", type=int, default=128)
    parser.add_argument("--n_workers", type=int, default=4)  # accepted for CLI parity; prefetch is threaded
    parser.add_argument("--prefix_lm", action="store_true", help="bidirectional attention over the audio prefix")
    args = parser.parse_args()

    assert args.synthetic or args.dataset_dir, "--dataset_dir required (or --synthetic)"

    audio_config = AudioConfig()
    # 40 s ⇒ 2000 audio tokens + ≤2096 text tokens ⇒ max_seq_len 4096
    # (≡ train_librispeech.py:166-170)
    from llama_x_tpu.train.cli import setup_mesh
    from llama_x_tpu.train.validate import validate_launch, validate_model

    mesh = setup_mesh(args)
    validate_launch(args, mesh, modality="audio", max_seq_len=4096)
    model, params, config, mask = build_model_params(args, LlamaAudio, mesh=mesh, max_seq_len=4096)
    validate_model(config, mesh, args, modality="audio")
    mesh, params, tx, schedule = setup_mesh_and_optimizer(args, params, mesh)

    micro_bs = args.batch_size // args.gradient_accumulation
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        data_iter = synthetic_audio_batches(
            rng, audio_config, micro_bs, args.audio_duration, args.seq_len_multiple, config.vocab_size
        )
    else:
        tokenizer = get_tokenizer(args.tokenizer, args.tokenizer_path)
        ds = LibriSpeechPacked(
            args.dataset_dir,
            tokenizer,
            audio_duration=args.audio_duration,
            seq_len_multiple=args.seq_len_multiple,
            batch_size=micro_bs,
            sample_rate=audio_config.sample_rate,
            seed=args.seed,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
        )
        data_iter = prefetch(iter(ds), depth=4)

    pp = mesh.shape.get("pp", 1)
    if pp > 1:
        # pipeline-parallel audio: the (tiny, replicated) stem runs outside the
        # pipeline; its embeddings are injected at stage 0 and the loss keeps
        # fuse_forward semantics exactly (parallel/pipeline.py prefix support)
        from llama_x_tpu.parallel.pipeline import pipeline_loss
        from llama_x_tpu.train.cli import pp_microbatch_count

        n_micro = pp_microbatch_count(args, mesh, micro_bs)

        def loss_fn(p, mb):
            prefix = audio_mod.audio_embed(
                p["audio_embed"], audio_config, mb["audio"],
                dtype=p["tok_embeddings"]["weight"].dtype,
            )
            loss = pipeline_loss(
                p, config, mb["tokens"], mb["labels"], mesh, n_micro,
                prefix_embeds=prefix, prefix_lm=args.prefix_lm,
            )
            return loss, jnp.sum(mb["labels"] != -100)

    else:

        def loss_fn(p, mb):
            loss = audio_mod.forward(
                p, config, audio_config, mb["audio"], mb["tokens"], labels=mb["labels"], prefix_lm=args.prefix_lm
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

    save_dir = make_save_dir("librispeech", args.run_name)
    save_model_config(save_dir, config, audio_config)
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

    # token count accumulates ON DEVICE between log points (no per-step host readback
    # through the slow relay); audio seconds are a host-side constant per step
    tok_acc, audio_acc = None, 0.0
    mem_fallback = None
    with use_mesh(mesh):
        while step < args.n_steps:
            batch = next(batch_iter)
            state, metrics = train_step(state, batch)
            tok_acc = metrics["n_tokens"] if tok_acc is None else tok_acc + metrics["n_tokens"]
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
