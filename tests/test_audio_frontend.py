"""Audio frontend numerics: STFT power spectrum golden-tested against torch.stft (the
exact component torchaudio's MelSpectrogram wraps), slaney filterbank property checks,
and the log+CMN chain (modelling/audio.py:53-55 semantics)."""

import numpy as np
import torch

import jax.numpy as jnp

from llama_x_tpu.ops.audio_frontend import (
    hann_window,
    log_mel_cmn,
    mel_filterbank,
    mel_spectrogram,
)

SR, N_FFT, WIN, HOP, N_MELS = 16_000, 512, 400, 160, 128


def _torch_power_spec(audio: np.ndarray) -> np.ndarray:
    """torchaudio Spectrogram(power=2) == |torch.stft|^2 with center reflect pad."""
    x = torch.tensor(audio)
    window = torch.hann_window(WIN, periodic=True)
    spec = torch.stft(
        x,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=window,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    return spec.abs().pow(2.0).numpy()  # [B, n_bins, n_frames]


def test_power_spectrogram_matches_torch_stft():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, SR)).astype(np.float32)  # 1 s

    # our mel path with identity filterbank = raw power spectrum
    mel = mel_spectrogram(jnp.asarray(audio), SR, N_FFT, WIN, HOP, N_MELS)
    # recompute power only: invert the fb multiply by using fb = I is not possible via
    # public API, so check mel = fb @ power directly against torch
    power_t = _torch_power_spec(audio)  # [B, bins, frames]
    fb = mel_filterbank(N_MELS, N_FFT, SR)
    mel_t = np.einsum("mn,bnf->bmf", fb, power_t)

    ours = np.asarray(mel)
    assert ours.shape == mel_t.shape, (ours.shape, mel_t.shape)
    np.testing.assert_allclose(ours, mel_t, rtol=2e-3, atol=1e-3)


def test_hann_window_periodic():
    w = hann_window(WIN)
    t = torch.hann_window(WIN, periodic=True).numpy()
    np.testing.assert_allclose(w, t, rtol=1e-6, atol=1e-7)


def test_mel_filterbank_properties():
    fb = mel_filterbank(N_MELS, N_FFT, SR)
    n_bins = N_FFT // 2 + 1
    assert fb.shape == (N_MELS, n_bins)
    assert np.all(fb >= 0)
    # each filter has nonzero support and is unimodal (triangular)
    for m in range(0, N_MELS, 16):
        row = fb[m]
        nz = np.flatnonzero(row)
        assert len(nz) > 0
        peak = row.argmax()
        assert np.all(np.diff(row[nz[0] : peak + 1]) >= -1e-9)
        assert np.all(np.diff(row[peak : nz[-1] + 1]) <= 1e-9)
    # slaney norm: filter area ≈ 2/(f_hi - f_lo) * triangle area == const bin-width sum
    # just check the rows aren't unit-peak (i.e. norm was applied)
    assert fb.max() < 0.5


def test_log_mel_cmn_zero_mean_and_frame_drop():
    rng = np.random.default_rng(1)
    mel = jnp.asarray(np.abs(rng.standard_normal((2, N_MELS, 101))).astype(np.float32))
    out = log_mel_cmn(mel, drop_last_frame=True, dtype=jnp.float32)
    assert out.shape == (2, N_MELS, 100)
    np.testing.assert_allclose(np.asarray(out).mean(axis=-1), 0.0, atol=1e-4)


def test_audio_token_rate():
    """40 s @ 16 kHz → 4000 mel frames (after drop) → 2000 audio tokens (50 tok/s,
    BASELINE derived constant)."""
    from llama_x_tpu.models.audio import AudioConfig

    ac = AudioConfig()
    assert ac.num_audio_tokens(40 * SR) == 2000
    assert ac.num_audio_tokens(SR) == 50


def test_dft_impl_matches_fft(rng):
    """The conv-DFT TPU backend must match the rFFT oracle bit-closely."""
    from llama_x_tpu.ops.audio_frontend import mel_spectrogram

    a = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    o1 = np.asarray(mel_spectrogram(a, impl="fft"))
    o2 = np.asarray(mel_spectrogram(a, impl="dft"))
    np.testing.assert_allclose(o2, o1, rtol=1e-3, atol=1e-6)
