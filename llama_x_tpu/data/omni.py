"""Mixed audio + image + text data pipeline for the omni model (BASELINE config 5).

A jsonl manifest drives it: one record per sample, ``{"text": caption_or_transcript,
"audio": relpath?, "image": relpath?}``. The modality set must be HOMOGENEOUS across
the manifest (every record carries the same keys) — batches are static-shape jit
inputs, so a sometimes-present modality would mean shape-polymorphic steps; split
heterogeneous corpora into per-modality manifests and alternate trainers instead.

Audio lands on the librispeech-style fixed window (zero-padded to
``audio_duration * sample_rate`` samples), images on the vision-style static canvas,
text right-padded to a multiple of ``seq_len_multiple`` with shifted -100-masked
labels. Yields {"audio"?: [B, T] f32, "images"?: [B, H, W, C] f32,
"tokens": [B, L] i32, "labels": [B, L] i32}.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from llama_x_tpu.data.librispeech import load_audio
from llama_x_tpu.data.vision import load_image


def index_manifest(data_dir: str | Path) -> list[dict]:
    """Records from manifest.jsonl, validated for a homogeneous modality set."""
    data_dir = Path(data_dir)
    path = data_dir / "manifest.jsonl"
    if not path.exists():
        raise FileNotFoundError(f"no manifest.jsonl in {data_dir}")
    records = [json.loads(line) for line in path.read_text().splitlines() if line.strip()]
    assert records, f"empty manifest {path}"
    keyset = {frozenset(k for k in r if k in ("audio", "image")) for r in records}
    assert len(keyset) == 1, (
        f"heterogeneous modality sets in {path}: {sorted(map(sorted, keyset))} — split "
        "into per-modality manifests (batches must be static-shape)"
    )
    return records


class OmniManifest:
    """Iterable of mixed-modality batches (see module docstring for the format)."""

    def __init__(
        self,
        data_dir: str,
        tokenizer,
        audio_duration: float = 40.0,
        image_size: int = 224,
        seq_len_multiple: int = 32,
        batch_size: int = 1,
        sample_rate: int = 16_000,
        max_text_len: int | None = None,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        self.data_dir = Path(data_dir)
        self.audio_duration = audio_duration
        self.image_size = image_size
        self.seq_len_multiple = seq_len_multiple
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.max_text_len = max_text_len
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.records = index_manifest(data_dir)
        self.has_audio = "audio" in self.records[0]
        self.has_image = "image" in self.records[0]
        self.tokenizer = tokenizer
        self.pad_id = tokenizer.pad_id

    def _prepare_batch(self, batch: list[dict]) -> dict:
        out: dict = {}
        if self.has_audio:
            T = int(self.audio_duration * self.sample_rate)
            audio = np.zeros((len(batch), T), np.float32)
            for i, s in enumerate(batch):
                wav = s["_wav"][:T]
                audio[i, : len(wav)] = wav
            out["audio"] = audio
        if self.has_image:
            out["images"] = np.stack([s["_img"] for s in batch])

        max_tok = max(len(s["_toks"]) for s in batch)
        L = -(-max_tok // self.seq_len_multiple) * self.seq_len_multiple
        if self.max_text_len is not None:
            L = min(L, self.max_text_len)
        tokens = np.full((len(batch), L), self.pad_id, np.int32)
        labels = np.full((len(batch), L), -100, np.int32)
        for i, s in enumerate(batch):
            toks = s["_toks"][:L]
            tokens[i, : len(toks)] = toks
            labels[i, : len(toks) - 1] = toks[1:]
        out["tokens"], out["labels"] = tokens, labels
        return out

    def _load(self, rec: dict) -> dict:
        s = dict(rec)
        s["_toks"] = self.tokenizer(f" {rec['text'].strip()}", add_bos=True, add_eos=True)
        if self.has_audio:
            wav, sr = load_audio(self.data_dir / rec["audio"])
            assert sr == self.sample_rate, (sr, self.sample_rate)
            s["_wav"] = wav
        if self.has_image:
            s["_img"] = load_image(self.data_dir / rec["image"], self.image_size)
        return s

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        batch: list = []
        while True:
            order = rng.permutation(len(self.records))[self.shard_index :: self.num_shards]
            for idx in order:
                batch.append(self._load(self.records[idx]))
                if len(batch) == self.batch_size:
                    yield self._prepare_batch(batch)
                    batch = []
