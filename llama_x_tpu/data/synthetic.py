"""Learnable synthetic text tasks (offline stand-ins for real corpora).

The trainers' ``--synthetic N`` smoke mode uses RANDOM tokens — fine for exercising
the step, useless for any experiment that needs a model to actually LEARN (the
speculative-decoding demonstration needs a trained target + trained draft whose
greedy trajectories agree where the task is predictable).

``count``: comma-separated incrementing integers from a random start, byte-level —
"184,185,186,...". Every continuation is DETERMINISTIC given the prefix, so a
trained target's greedy decode is the true continuation and a much smaller trained
draft can propose it correctly; the acceptance rate measured on this task is real
model agreement (learned multi-digit increment incl. carries), not a rigged
sampler. The reference has no synthetic-task module (its trainers are dataset-only,
train_metamathqa.py:1-40); this is offline-image tooling.
"""

from __future__ import annotations

import numpy as np


def counting_text(start: int, n_chars: int) -> str:
    """"{start},{start+1},..." truncated to n_chars."""
    out = []
    total = 0
    v = start
    while total < n_chars:
        s = f"{v},"
        out.append(s)
        total += len(s)
        v += 1
    return "".join(out)[:n_chars]


def counting_samples(n: int, seed: int, max_chars: int, lo: int = 1, hi: int = 5000) -> list[str]:
    """n independent counting sequences with random starts (carry-heavy ranges)."""
    rng = np.random.default_rng(seed)
    return [counting_text(int(rng.integers(lo, hi)), max_chars) for _ in range(n)]


def counting_tokens(n: int, seed: int, max_chars: int, tok) -> list[np.ndarray]:
    """Byte-tokenized counting samples for get_metamathqa(tokens_list=...)."""
    return [
        np.asarray(tok(s, add_bos=True), np.int32)
        for s in counting_samples(n, seed, max_chars)
    ]


def counting_prompt(rng: np.random.Generator, n_chars: int = 24, lo: int = 1, hi: int = 5000) -> str:
    """A held-out prefix whose continuation is deterministic (bench prompts)."""
    return counting_text(int(rng.integers(lo, hi)), n_chars)


def counting_accuracy(prompt: str, completion: str, n_check: int = 64) -> float:
    """Fraction of the first n_check completion chars matching the true continuation
    (quality gate for the trained pair; robust to completions shorter than n_check)."""
    # reconstruct the true continuation from the prompt's first number
    start = int(prompt.split(",")[0])
    full = counting_text(start, len(prompt) + n_check + 16)
    want = full[len(prompt) : len(prompt) + n_check]
    got = completion[:n_check]
    if not got:
        return 0.0
    k = min(len(got), len(want))
    return sum(a == b for a, b in zip(got[:k], want[:k])) / max(k, 1)
