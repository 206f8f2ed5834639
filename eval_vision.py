"""Image-captioning evaluation: greedy decode with the Fuyu-style image model and
score exact-match accuracy + word error rate (the vision counterpart of
eval_librispeech.py; the reference has no eval surface at all).

``--resume`` takes a train_vision.py run dir (or a step checkpoint inside one): params
are restored via the production checkpoint path and the architecture rebuilt from the
run's model_config.json. ``--synthetic N`` scores N samples of the offline
colored-shapes task from its EVAL split (combinations disjoint from training —
data/vision.py:shapes_split), so a good score requires reading pixels.

usage:
  python eval_vision.py --data_dir data/captions_val --resume runs/vision/<run>
  python eval_vision.py --synthetic 32 --resume runs/vision/<run>   # offline
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from llama_x_tpu.data.tokenizers import get_tokenizer
from llama_x_tpu.models import llama
from llama_x_tpu.models import vision as vision_mod
from llama_x_tpu.models.generate import generate
from llama_x_tpu.models.vision import LlamaVision, VisionConfig
from llama_x_tpu.train.wer import wer


def caption_batch(model: LlamaVision, images: jnp.ndarray, tokenizer, max_new_tokens: int, prefix_lm: bool):
    """images [B, H, W, C] → list[str] greedy captions."""
    embed_dtype = model.params["tok_embeddings"]["weight"].dtype
    prefix = vision_mod.patch_embed(
        model.params["patch_embed"], model.vision_config, images, dtype=embed_dtype
    )
    bos = jnp.full((images.shape[0], 1), tokenizer.bos_id, jnp.int32)
    out = generate(
        model.params,
        model.config,
        bos,
        max_new_tokens=max_new_tokens,
        eos_id=tokenizer.eos_id,
        pad_id=tokenizer.pad_id,
        prefix_embeds=prefix,
        prefix_lm=prefix_lm,
    )
    texts = []
    for row in np.asarray(out):
        toks = [int(t) for t in row if t not in (tokenizer.pad_id, tokenizer.eos_id)]
        texts.append(tokenizer.decode(toks).strip())
    return texts


def _caption_batched(model, images: list[np.ndarray], tokenizer, args) -> list[str]:
    """Fixed-size batches (tail padded, extra rows dropped) — one compiled shape."""
    B = max(1, args.eval_batch_size)
    hyps: list[str] = []
    for i in range(0, len(images), B):
        chunk = images[i : i + B]
        buf = np.zeros((B, *chunk[0].shape), np.float32)
        for j, im in enumerate(chunk):
            buf[j] = im
        texts = caption_batch(model, jnp.asarray(buf), tokenizer, args.max_new_tokens, args.prefix_lm)
        hyps.extend(texts[: len(chunk)])
    return hyps


def _score(refs: list[str], hyps: list[str]) -> dict:
    exact = sum(r == h for r, h in zip(refs, hyps)) / max(len(refs), 1)
    return {"exact_match": exact, "wer": wer(refs, hyps), "n_samples": len(refs)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir")
    parser.add_argument("--model", default="TinyLlama/TinyLlama_v1.1")
    parser.add_argument("--tokenizer", default="llama2")
    parser.add_argument("--tokenizer_path")
    parser.add_argument("--resume", help="train_vision.py run dir to restore params from")
    parser.add_argument("--max_samples", type=int, default=100)
    parser.add_argument("--max_new_tokens", type=int, default=64)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--patch_size", type=int, default=14)
    parser.add_argument("--prefix_lm", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0, help="N shapes-task eval-split samples (offline)")
    parser.add_argument("--eval_batch_size", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from llama_x_tpu.utils.cache import enable_compilation_cache
    from llama_x_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    enable_compilation_cache()

    def find_saved_config(run_dir: Path):
        from llama_x_tpu.train.cli import load_model_configs

        return load_model_configs(run_dir) or load_model_configs(run_dir.parent)

    def restore_into(model):
        from llama_x_tpu.train.checkpoint import latest_checkpoint, restore_params

        run_dir = Path(args.resume)
        path = latest_checkpoint(run_dir) or run_dir
        saved = find_saved_config(run_dir)
        if saved is not None:
            model.config = saved[0]
            if saved[2] is not None:
                model.vision_config = saved[2]
        params, step = restore_params(path)
        model.params = jax.tree.map(jnp.asarray, params)
        print(f"restored step-{step} params from {path}")
        return model

    if args.synthetic:
        from llama_x_tpu.data.tokenizers import ByteTokenizer
        from llama_x_tpu.data.vision import make_shapes_sample

        tokenizer = ByteTokenizer()
        config = llama.tiny_config(
            embed_dim=256, num_layers=4, head_dim=32, num_heads=8, num_kv_heads=4,
            intermediate_dim=512, vocab_size=512, max_seq_len=512,
        )
        vc = VisionConfig(image_size=args.image_size, patch_size=args.patch_size)
        model = LlamaVision.init(jax.random.PRNGKey(0), config, vc, dtype=jnp.bfloat16)
        if args.resume:
            model = restore_into(model)
        rng = np.random.default_rng(args.seed)
        images, refs = [], []
        for _ in range(args.synthetic):
            img, caption = make_shapes_sample(rng, model.vision_config.image_size, split="eval")
            images.append(img)
            refs.append(caption)
        hyps = _caption_batched(model, images, tokenizer, args)
        print(json.dumps({**_score(refs, hyps), "synthetic": True}))
        return

    tokenizer = get_tokenizer(args.tokenizer, args.tokenizer_path)
    resume_dir = Path(args.resume) if args.resume else None
    if resume_dir is not None and find_saved_config(resume_dir) is not None:
        model = restore_into(LlamaVision({}, None))
    else:
        model = LlamaVision.from_hf(
            args.model, image_size=args.image_size, patch_size=args.patch_size, max_seq_len=4096
        )
        if args.resume:
            model = restore_into(model)

    from llama_x_tpu.data.vision import index_captions, load_image

    samples = index_captions(args.data_dir)[: args.max_samples]
    images = [load_image(Path(args.data_dir) / rel, model.vision_config.image_size) for rel, _ in samples]
    refs = [text.strip() for _, text in samples]
    hyps = _caption_batched(model, images, tokenizer, args)
    print(json.dumps(_score(refs, hyps)))


if __name__ == "__main__":
    main()
