"""Synthetic end-to-end OMNI artifact: one tiny model, BOTH modality prefixes, one
caption that can only be produced by reading BOTH (BASELINE config 5's learned-task
proof, completing the wer_synthetic / vision_synthetic pair).

Each sample is (audio, image, text): the audio is a two-tone sequence encoding two
words (the wer_synthetic scheme), the image shows one colored shape (the
vision_synthetic rasterizer), and the target text is
"<tone-word> <tone-word> <color> <shape>" — the first half is recoverable only from
the waveform, the second only from the pixels. Train/eval splits are disjoint on the
JOINT (audio, image) combination (quadruples with sum % 4 == 0 are eval-only; see
make_sample for why per-modality pair holdout is out of a tiny model's reach).

Production path at every stage: train (prefix-LM omni fusion, models/omni.py)
-> save_checkpoint -> restore_params -> generate() with the concatenated
audio+image prefix -> per-half word accuracy. Artifact: runs/omni_synthetic/omni.json.

usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=cpu python tools/omni_synthetic.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.adapters import trainable_mask
from llama_x_tpu.data.tokenizers import ByteTokenizer
from llama_x_tpu.data.vision import COLOR_NAMES, COLORS, SHAPES, _draw_shape
from llama_x_tpu.models import llama
from llama_x_tpu.models import omni as omni_mod
from llama_x_tpu.models.audio import AudioConfig
from llama_x_tpu.models.omni import LlamaOmni
from llama_x_tpu.models.vision import VisionConfig
from llama_x_tpu.train.checkpoint import restore_params, save_checkpoint
from llama_x_tpu.train.optim import get_optimizer, trapezoid_schedule
from llama_x_tpu.train.trainer import init_train_state, make_train_step
from llama_x_tpu.train.wer import wer

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
FREQS = [220.0 * 2 ** (i / 2) for i in range(len(WORDS))]
TONE_SECS = 0.5
SR = 16_000
TEXT_LEN = 40
IMAGE_SIZE = 48
PATCH_SIZE = 6  # finer grid: shape geometry resolvable independently of fill color
                # (same fix as tools/vision_synthetic.py — patch 8 left shapes at 0%
                # held-out accuracy while colors saturated)


def make_sample(rng: np.random.Generator, split: str):
    """-> (waveform [T], image [H,W,3], caption).

    Split is disjoint on the JOINT (audio, image) combination — eval quadruples
    (w1+w2+ci+si) % 4 == 0 never occur in training, while every individual tone pair
    and every (color, shape) pair does. The caption's image half is uncorrelated with
    its audio half (pairing is random), so scoring it still requires reading pixels;
    holding out raw (color, shape) PAIRS instead demands compositional generalization
    a 4-layer model doesn't reach (measured: colors saturate, shapes stay at 0%) —
    same design as tools/vision_synthetic.py's joint-index split."""
    while True:
        w1, w2 = int(rng.integers(len(WORDS))), int(rng.integers(len(WORDS)))
        ci, si = int(rng.integers(len(COLOR_NAMES))), int(rng.integers(len(SHAPES)))
        if (((w1 + w2 + ci + si) % 4 == 0) == (split == "eval")):
            break
    t = np.arange(int(TONE_SECS * SR)) / SR
    wav = np.concatenate(
        [np.sin(2 * np.pi * FREQS[i] * t) * 0.3 for i in (w1, w2)]
    ).astype(np.float32)

    H = IMAGE_SIZE
    img = rng.standard_normal((H, H, 3)).astype(np.float32) * 0.05 - 0.5
    q = H // 4
    r = int(rng.integers(q // 2 + 1, q + 1))
    _draw_shape(img, SHAPES[si], COLORS[COLOR_NAMES[ci]],
                2 * q + int(rng.integers(-4, 5)), 2 * q + int(rng.integers(-4, 5)), r)

    caption = f"{WORDS[w1]} {WORDS[w2]} {COLOR_NAMES[ci]} {SHAPES[si]}"
    return wav, img, caption


def encode_text(tok: ByteTokenizer, text: str):
    ids = tok(text, add_bos=True, add_eos=True)
    tokens = np.full(TEXT_LEN, tok.pad_id, np.int32)
    tokens[: len(ids)] = ids
    labels = np.full(TEXT_LEN, -100, np.int32)
    labels[: len(ids) - 1] = ids[1:]
    return tokens, labels


def batches(rng, tok, batch_size):
    while True:
        audio, images, tokens, labels = [], [], [], []
        for _ in range(batch_size):
            wav, img, caption = make_sample(rng, "train")
            t, l = encode_text(tok, caption)
            audio.append(wav)
            images.append(img)
            tokens.append(t)
            labels.append(l)
        yield {
            "audio": jnp.asarray(np.stack(audio))[None],
            "images": jnp.asarray(np.stack(images))[None],
            "tokens": jnp.asarray(np.stack(tokens))[None],
            "labels": jnp.asarray(np.stack(labels))[None],
        }


def eval_model(params, config, audio_config, vision_config, tok, rng, n_samples):
    """Greedy decode held-out samples; score each modality's caption half separately."""
    from llama_x_tpu.models.generate import generate
    from llama_x_tpu.models.audio import audio_embed
    from llama_x_tpu.models.vision import patch_embed

    refs, hyps = [], []
    audio_hits = image_hits = 0
    embed_dtype = params["tok_embeddings"]["weight"].dtype
    for _ in range(n_samples):
        wav, img, caption = make_sample(rng, "eval")
        pa = audio_embed(params["audio_embed"], audio_config, jnp.asarray(wav[None]), dtype=embed_dtype)
        pi = patch_embed(params["patch_embed"], vision_config, jnp.asarray(img[None]), dtype=embed_dtype)
        prefix = jnp.concatenate([pa, pi], axis=1)  # audio first (omni.forward order)
        bos = jnp.full((1, 1), tok.bos_id, jnp.int32)
        out = generate(
            params, config, bos, max_new_tokens=TEXT_LEN, eos_id=tok.eos_id,
            pad_id=tok.pad_id, prefix_embeds=prefix, prefix_lm=True,
        )
        row = [int(t) for t in np.asarray(out)[0] if t not in (tok.pad_id, tok.eos_id)]
        hyp = tok.decode(row).strip()
        refs.append(caption)
        hyps.append(hyp)
        rw, hw = caption.split(), hyp.split()
        audio_hits += len(hw) >= 2 and hw[:2] == rw[:2]
        image_hits += len(hw) >= 4 and hw[2:4] == rw[2:4]
    return {
        "wer": wer(refs, hyps),
        "audio_half_acc": audio_hits / n_samples,
        "image_half_acc": image_hits / n_samples,
    }, refs, hyps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--eval_samples", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", default="runs/omni_synthetic")
    args = parser.parse_args()

    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    tok = ByteTokenizer()
    config = llama.tiny_config(
        embed_dim=256, num_layers=4, head_dim=32, num_heads=8, num_kv_heads=4,
        intermediate_dim=768, vocab_size=tok.vocab_size + 5, max_seq_len=512,
    )
    audio_config = AudioConfig()
    vision_config = VisionConfig(image_size=IMAGE_SIZE, patch_size=PATCH_SIZE)
    model = LlamaOmni.init(jax.random.PRNGKey(args.seed), config, audio_config, vision_config, dtype=jnp.float32)
    params = model.params
    mask = trainable_mask(params)

    def loss_fn(p, mb):
        loss = omni_mod.forward(
            p, config, audio_config, vision_config, mb["audio"], mb["images"], mb["tokens"],
            labels=mb["labels"], prefix_lm=True,
        )
        return loss, jnp.sum(mb["labels"] != -100)

    tx = get_optimizer("AdamW", trapezoid_schedule(args.lr, args.steps, 0.05, 0.4), weight_decay=0.01)
    state = init_train_state(params, mask, tx)
    step_fn = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    eval_rng = np.random.default_rng(args.seed + 10_000)
    before, _, _ = eval_model(params, config, audio_config, vision_config, tok, eval_rng, args.eval_samples)
    print(f"before training: {before}")

    data = batches(np.random.default_rng(args.seed), tok, args.batch_size)
    t0 = time.perf_counter()
    losses = []
    for step in range(args.steps):
        state, metrics = step_fn(state, next(data))
        if step % 50 == 0 or step == args.steps - 1:
            loss = float(metrics["loss"])
            losses.append(loss)
            print(f"step {step}: loss {loss:.4f}")
    train_s = time.perf_counter() - t0

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stale = out_dir / f"step_{args.steps:08d}"
    if stale.exists():  # rerun over an old artifact dir: orbax refuses to overwrite
        import shutil

        shutil.rmtree(stale)
    save_checkpoint(out_dir, state, args.steps)
    restored, _ = restore_params(out_dir / f"step_{args.steps:08d}")
    restored = jax.tree.map(jnp.asarray, restored)
    eval_rng = np.random.default_rng(args.seed + 10_000)
    after, refs, hyps = eval_model(
        restored, config, audio_config, vision_config, tok, eval_rng, args.eval_samples
    )
    print(f"after {args.steps} steps: {after}")
    for r, h in list(zip(refs, hyps))[:4]:
        print(f"  ref: {r!r}  hyp: {h!r}")

    artifact = {
        "task": "joint tone-pair ASR + single-shape captioning: caption halves are "
        "recoverable only from their own modality; eval JOINT (audio, image) "
        "combinations (sum of all indices % 4 == 0) never occur in training",
        "before": {k: round(v, 4) for k, v in before.items()},
        "after": {k: round(v, 4) for k, v in after.items()},
        "steps": args.steps,
        "final_loss": losses[-1],
        "train_seconds": round(train_s, 1),
        "n_eval_samples": args.eval_samples,
        "restored_from_checkpoint": True,
    }
    (out_dir / "omni.json").write_text(json.dumps(artifact, indent=1))
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
