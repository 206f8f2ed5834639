"""Word error rate (WER) — the ASR quality metric for LibriSpeech parity runs
(BASELINE.md: 'LibriSpeech step time + WER parity'). The reference logs only loss;
WER evaluation is part of this framework's eval surface (eval_librispeech.py)."""

from __future__ import annotations


def edit_distance(ref: list[str], hyp: list[str]) -> int:
    """Word-level Levenshtein distance (substitutions + insertions + deletions)."""
    m, n = len(ref), len(hyp)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[n]


def wer(refs: list[str], hyps: list[str]) -> float:
    """Corpus WER: total edits / total reference words over utterance pairs."""
    assert len(refs) == len(hyps), (len(refs), len(hyps))
    edits = 0
    words = 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        edits += edit_distance(rw, hw)
        words += len(rw)
    return edits / max(words, 1)
