"""Data pipeline tests: padding buckets, packed segment ids, LibriSpeech indexing
(including the reference quirk fix) and utterance packing — all offline with the byte
tokenizer and synthetic wav files."""

import wave
from pathlib import Path

import numpy as np
import pytest

from llama_x_tpu.data.librispeech import LibriSpeechPacked, index_librispeech, load_audio
from llama_x_tpu.data.metamathqa import iter_packed, iter_padding, next_multiple
from llama_x_tpu.data.tokenizers import ByteTokenizer, get_tokenizer


def _fake_tokens(n, rng, lo=5, hi=120):
    return [np.arange(1, rng.integers(lo, hi)) .astype(np.int32) for _ in range(n)]


def test_iter_padding_shapes_and_shift():
    rng = np.random.default_rng(0)
    tokens_list = _fake_tokens(20, rng)
    it = iter_padding(tokens_list, batch_size=4, seq_len_multiple=16)
    batch = next(it)
    B, L = batch["inputs"].shape
    assert B == 4 and L % 16 == 0
    assert batch["labels"].shape == (B, L)
    # shift: wherever label != -100, label[t] == input[t+1-ish] per original sequence
    for r in range(B):
        valid = batch["labels"][r] != -100
        n = valid.sum()
        np.testing.assert_array_equal(batch["inputs"][r][1:n], batch["labels"][r][: n - 1])
    # pads are 0-input, -100-label
    assert (batch["labels"][batch["inputs"] == 0] == -100).all()


def test_iter_packed_segments():
    rng = np.random.default_rng(1)
    tokens_list = _fake_tokens(50, rng, lo=5, hi=40)
    it = iter_packed(tokens_list, seq_len=128, batch_rows=2)
    batch = next(it)
    assert batch["inputs"].shape == (2, 128)
    seg = batch["segment_ids"]
    # doc ids increase monotonically along the row; 0 only at tail padding
    for r in range(2):
        s = seg[r]
        nz = s[s != 0]
        assert (np.diff(nz) >= 0).all()
        # labels -100 exactly at padding
        np.testing.assert_array_equal(batch["labels"][r] == -100, s == 0)
    # every doc is contiguous and the shift holds within each doc
    for r in range(2):
        for d in np.unique(seg[r][seg[r] != 0]):
            idx = np.flatnonzero(seg[r] == d)
            assert (np.diff(idx) == 1).all()
            inp = batch["inputs"][r][idx]
            lbl = batch["labels"][r][idx]
            np.testing.assert_array_equal(inp[1:], lbl[:-1])


def test_sharding_disjoint():
    rng = np.random.default_rng(2)
    tokens_list = _fake_tokens(16, rng, lo=3, hi=8)
    a = next(iter_padding(tokens_list, 2, 8, seed=7, num_shards=2, shard_index=0))
    b = next(iter_padding(tokens_list, 2, 8, seed=7, num_shards=2, shard_index=1))
    assert not np.array_equal(a["inputs"], b["inputs"])


def _write_wav(path: Path, seconds: float, sr: int = 16_000, freq: float = 440.0):
    t = np.arange(int(seconds * sr)) / sr
    x = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture
def librispeech_dir(tmp_path):
    """Synthetic LibriSpeech layout: spk/chap/spk-chap.trans.txt + .wav files."""
    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    lines = []
    for i, dur in enumerate([1.0, 1.5, 0.8, 2.0]):
        utt = f"19-198-{i:04d}"
        _write_wav(d / f"{utt}.wav", dur)
        lines.append(f"{utt} HELLO WORLD NUMBER {i}")
    (d / "19-198.trans.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_index_reads_all_lines(librispeech_dir):
    """The reference indexes only the LAST line per trans file
    (train_librispeech.py:56-61) — we index all four."""
    tok = ByteTokenizer()
    samples = index_librispeech(librispeech_dir, tok)
    assert len(samples) == 4
    # text normalization: ' {text.lower()}.'
    decoded = tok.decode(samples[0][1])
    assert decoded == " hello world number 0."


def test_load_audio_wav_roundtrip(librispeech_dir):
    path = next(librispeech_dir.glob("**/*.wav"))
    x, sr = load_audio(path)
    assert sr == 16_000 and x.dtype == np.float32
    assert 0.2 < np.abs(x).max() <= 0.31  # 0.3 sine amplitude


def test_librispeech_packing(librispeech_dir):
    tok = ByteTokenizer()
    ds = LibriSpeechPacked(
        str(librispeech_dir), tok, audio_duration=4.0, seq_len_multiple=32, batch_size=2
    )
    batch = next(iter(ds))
    B, T = batch["audio"].shape
    assert B == 2 and T == 4 * 16_000
    L = batch["tokens"].shape[1]
    assert L % 32 == 0
    # each window: bos ... eos, pad after
    for r in range(B):
        toks = batch["tokens"][r]
        assert toks[0] == tok.bos_id
        eos_pos = np.flatnonzero(toks == tok.eos_id)
        assert len(eos_pos) == 1
        assert (toks[eos_pos[0] + 1 :] == tok.pad_id).all()
        # labels: shifted tokens, -100 on pads
        lbl = batch["labels"][r]
        np.testing.assert_array_equal(lbl[: eos_pos[0]], toks[1 : eos_pos[0] + 1])
        assert (lbl[eos_pos[0] :] == -100).all()


def test_tokenizer_registry():
    tok = get_tokenizer("byte")
    ids = tok("hi", add_bos=True, add_eos=True)
    assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
    assert tok.decode(ids) == "hi"
    with pytest.raises(KeyError):
        get_tokenizer("nope")


def test_next_multiple():
    assert next_multiple(1, 256) == 256
    assert next_multiple(256, 256) == 256
    assert next_multiple(257, 256) == 512
