"""Native FLAC decoder (native/flacdec.cc via ctypes) round-trip tests against the
pure-Python test encoder (tests/flac_encoder.py): bit-reader, rice coding, fixed
predictors, multi-frame streams, stereo downmix, and the LibriSpeech load_audio hook."""

import numpy as np
import pytest

from llama_x_tpu.data.flac import decode_flac, flac_available
from tests.flac_encoder import encode_flac

pytestmark = pytest.mark.skipif(not flac_available(), reason="g++ unavailable")


def _sine(t_samples, freq=440.0, sr=16_000, amp=0.3):
    t = np.arange(t_samples) / sr
    return np.round(np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int32)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2", "lpc2"])
def test_roundtrip_modes(mode):
    x = _sine(5000)  # several frames at blocksize 1024 + a short last frame
    data = encode_flac(x, mode=mode)
    y, sr = decode_flac(data)
    assert sr == 16_000
    np.testing.assert_allclose(y * 32768.0, x.astype(np.float32), atol=0.5)


def test_roundtrip_constant():
    x = np.full(3000, -1234, np.int32)
    data = encode_flac(x, mode="constant")
    y, sr = decode_flac(data)
    np.testing.assert_allclose(y * 32768.0, x.astype(np.float32), atol=0.5)


def test_roundtrip_random_noise():
    """Worst case for rice (high entropy) — still must be exact."""
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 4096).astype(np.int32)
    data = encode_flac(x, mode="fixed1")
    y, _ = decode_flac(data)
    np.testing.assert_allclose(y * 32768.0, x.astype(np.float32), atol=0.5)


def test_stereo_downmix():
    left = _sine(2048, 440.0)
    right = _sine(2048, 880.0)
    x = np.stack([left, right], axis=1)
    data = encode_flac(x, mode="fixed2")
    y, _ = decode_flac(data)
    want = (left + right).astype(np.float32) / 2.0 / 32768.0
    np.testing.assert_allclose(y, want, atol=1e-4)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_flac(b"not a flac stream at all........")


def test_load_audio_flac(tmp_path):
    from llama_x_tpu.data.librispeech import load_audio

    x = _sine(16_000)
    p = tmp_path / "utt.flac"
    p.write_bytes(encode_flac(x))
    y, sr = load_audio(p)
    assert sr == 16_000 and y.dtype == np.float32
    np.testing.assert_allclose(y * 32768.0, x.astype(np.float32), atol=0.5)
