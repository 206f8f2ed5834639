"""MetaMathQA SFT data pipeline (≡ get_metamathqa + iterators,
train_metamathqa.py:25-127), redesigned for TPU static shapes.

Two batching modes, as in the reference:

- **bucketed padding** (≡ _data_iter_padding, train_metamathqa.py:29-48): shuffle each
  epoch, batch, pad to the batch max rounded up to ``seq_len_multiple``. The reference's
  per-batch dynamic length becomes a *small finite set of bucket shapes*
  (seq_len_multiple, 2x, ... max_seq_len), so the jitted step compiles once per bucket
  instead of per batch. Labels are -100 on pads; the input/label shift happens here in
  data, exactly like the reference.

- **packed + segment ids** (≡ _data_iter_document_mask, train_metamathqa.py:51-83):
  whole samples packed into rows with a per-token document id; the attention kernel
  consumes the ids directly (MaskInfo.segment_ids) — no block-mask object to build.
  Improvement over the reference (which packs batch_size*max_seq_len tokens into ONE
  row): we pack into ``batch_size`` rows of ``max_seq_len``, cutting the attention cost
  from O((B*S)^2) blocks to B*O(S^2) while keeping identical masking semantics.
  Segment id 0 = padding; real documents count from 1.

Tokenization is done once and cached to disk keyed by tokenizer name
(≡ train_metamathqa.py:100-121); dataset download is network-gated, and every consumer
can instead pass ``tokens_list`` directly (tests, synthetic data).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

PROMPT_TEMPLATE = (
    "Below is an instruction that describes a task. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{query}\n\n"
    "### Response: Let's think step by step."
)


def next_multiple(x: int, n: int) -> int:
    return (x + n - 1) // n * n


def tokenize_metamathqa(tokenizer, tokenizer_name: str, max_seq_len: int, cache_dir: str = ".") -> list[np.ndarray]:
    """Tokenize once, cache to an .npz keyed by tokenizer name + max_seq_len (samples
    are truncated at tokenization time, so the length is part of the key; reference caches an HF
    dataset dir, train_metamathqa.py:100-121; an npz of ragged int32 arrays is lighter)."""
    cache = Path(cache_dir) / f"metamathqa_{tokenizer_name}_s{max_seq_len}.npz"
    if cache.exists():
        with np.load(cache, allow_pickle=False) as z:
            flat, offsets = z["flat"], z["offsets"]
        return [flat[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]

    from datasets import load_dataset

    ds = load_dataset("meta-math/MetaMathQA", split="train")
    tokens_list = []
    for ex in ds:
        prompt = PROMPT_TEMPLATE.format(query=ex["query"])
        answer = " " + ex["response"]
        toks = tokenizer(prompt, add_bos=True) + tokenizer(answer, add_eos=True)
        tokens_list.append(np.asarray(toks[: max_seq_len + 1], np.int32))

    flat = np.concatenate(tokens_list)
    offsets = np.zeros(len(tokens_list) + 1, np.int64)
    np.cumsum([len(t) for t in tokens_list], out=offsets[1:])
    tmp = str(cache) + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, flat=flat, offsets=offsets)
    os.replace(tmp, cache)
    return tokens_list


def iter_padding(
    tokens_list: list[np.ndarray],
    batch_size: int,
    seq_len_multiple: int = 256,
    max_seq_len: int | None = None,
    seed: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
):
    """Yields {"inputs": [B, L], "labels": [B, L]} with L a bucket multiple.

    Data is sharded across hosts (new vs the reference, which had no sharding —
    train_librispeech.py:95-96 notes the gap)."""
    rng = np.random.default_rng(seed)
    n = len(tokens_list)
    epoch = 0
    while True:
        order = rng.permutation(n)[shard_index::num_shards]
        for i in range(0, len(order) - batch_size + 1, batch_size):
            chunk = [tokens_list[j] for j in order[i : i + batch_size]]
            length = max(next_multiple(len(t) - 1, seq_len_multiple) for t in chunk)
            if max_seq_len is not None:
                length = min(length, max_seq_len)
            inputs = np.zeros((batch_size, length), np.int32)
            labels = np.full((batch_size, length), -100, np.int32)
            for r, toks in enumerate(chunk):
                m = min(len(toks) - 1, length)
                inputs[r, :m] = toks[:m]
                labels[r, :m] = toks[1 : m + 1]
            yield {"inputs": inputs, "labels": labels}
        epoch += 1


def iter_packed(
    tokens_list: list[np.ndarray],
    seq_len: int,
    batch_rows: int = 1,
    seed: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
):
    """Yields {"inputs": [R, S], "labels": [R, S], "segment_ids": [R, S]} fully packed.

    Masking semantics ≡ the reference document mask (same-doc AND causal,
    train_metamathqa.py:67-68); id 0 marks padding (labels already -100 there).
    """
    rng = np.random.default_rng(seed)

    def row_stream():
        inputs = np.zeros(seq_len, np.int32)
        labels = np.full(seq_len, -100, np.int32)
        seg = np.zeros(seq_len, np.int32)
        fill, doc = 0, 1
        while True:
            order = rng.permutation(len(tokens_list))[shard_index::num_shards]
            for j in order:
                toks = tokens_list[j]
                m = len(toks) - 1
                if m > seq_len:
                    continue  # sample longer than a row can hold
                if fill + m > seq_len:
                    yield inputs, labels, seg
                    inputs = np.zeros(seq_len, np.int32)
                    labels = np.full(seq_len, -100, np.int32)
                    seg = np.zeros(seq_len, np.int32)
                    fill, doc = 0, 1
                inputs[fill : fill + m] = toks[:-1][:m]
                labels[fill : fill + m] = toks[1:][:m]
                seg[fill : fill + m] = doc
                fill += m
                doc += 1

    rows = row_stream()
    while True:
        batch = [next(rows) for _ in range(batch_rows)]
        yield {
            "inputs": np.stack([b[0] for b in batch]),
            "labels": np.stack([b[1] for b in batch]),
            "segment_ids": np.stack([b[2] for b in batch]),
        }


def get_metamathqa(
    tokenizer_name: str,
    document_mask: bool,
    batch_size: int,
    max_seq_len: int,
    seq_len_multiple: int = 256,
    tokens_list: list[np.ndarray] | None = None,
    seed: int = 0,
    num_shards: int = 1,
    shard_index: int = 0,
    cache_dir: str = ".",
):
    """≡ get_metamathqa (train_metamathqa.py:86-127). Returns (iterator, dataset_size)."""
    if tokens_list is None:
        from llama_x_tpu.data.tokenizers import get_tokenizer

        tokenizer = get_tokenizer(tokenizer_name)
        tokens_list = tokenize_metamathqa(tokenizer, tokenizer_name, max_seq_len, cache_dir)

    if document_mask:
        it = iter_packed(
            tokens_list, max_seq_len, batch_rows=batch_size, seed=seed, num_shards=num_shards, shard_index=shard_index
        )
    else:
        it = iter_padding(
            tokens_list, batch_size, seq_len_multiple, max_seq_len, seed=seed, num_shards=num_shards, shard_index=shard_index
        )
    return it, len(tokens_list)
