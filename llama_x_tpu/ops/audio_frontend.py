"""Audio frontend: log-mel spectrogram + cepstral mean normalization.

Numerics spec = torchaudio MelSpectrogram(norm="slaney", mel_scale="slaney") with
AudioConfig(sample_rate=16k, n_fft=512, win=400, hop=160, n_mels=128) as used at
modelling/audio.py:12-17,33-36,53-55:

  reflect-pad n_fft//2 both sides (center=True) → hann(win, periodic) window zero-padded
  to n_fft → rFFT → power (|.|^2) → slaney mel filterbank (f 0..sr/2) with slaney area
  norm → (model drops the last frame, clips at 1e-12, log10, per-channel mean subtract).

The reference wraps the STFT in torch._dynamo.disable because FFT doesn't compile there
(audio.py:36); on TPU the whole chain is jittable — XLA lowers the rFFT natively and the
mel projection is a single MXU matmul, so the frontend fuses into the step with no
host round-trip (BASELINE target: preprocessing < 5% of step, overlapped).

Window/filterbank are numpy constants folded in at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length)).astype(np.float32)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f * 3.0 / 200.0)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), m * 200.0 / 3.0)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] slaney-scale triangular filters with slaney area norm."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    f_pts = _mel_to_hz_slaney(mel_pts)  # [n_mels + 2]

    rising = (fft_freqs[None, :] - f_pts[:-2, None]) / np.maximum(f_pts[1:-1, None] - f_pts[:-2, None], 1e-10)
    falling = (f_pts[2:, None] - fft_freqs[None, :]) / np.maximum(f_pts[2:, None] - f_pts[1:-1, None], 1e-10)
    fb = np.maximum(0.0, np.minimum(rising, falling))

    # slaney normalization: scale each filter to constant area
    enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
    fb = fb * enorm[:, None]
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "win_length", "hop_length", "n_mels", "sample_rate"))
def mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int = 16_000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
) -> jnp.ndarray:
    """audio [B, T] float32 → mel power spectrogram [B, n_mels, 1 + T//hop]."""
    B, T = audio.shape
    pad = n_fft // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")

    n_frames = 1 + T // hop_length
    # frame: [B, n_frames, n_fft] via strided gather (XLA lowers to an efficient slice)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[:, idx]  # [B, n_frames, n_fft]

    win = hann_window(win_length)
    lpad = (n_fft - win_length) // 2
    win_full = np.zeros(n_fft, np.float32)
    win_full[lpad : lpad + win_length] = win
    frames = frames * win_full[None, None, :]

    spec = jnp.fft.rfft(frames, n_fft, axis=-1)  # [B, n_frames, n_bins]
    power = jnp.square(spec.real) + jnp.square(spec.imag)

    fb = mel_filterbank(n_mels, n_fft, sample_rate)  # [n_mels, n_bins]
    mel = jnp.einsum("bfn,mn->bmf", power, fb)  # [B, n_mels, n_frames]
    return mel


def log_mel_cmn(mel: jnp.ndarray, drop_last_frame: bool = True, dtype=jnp.bfloat16) -> jnp.ndarray:
    """clip(1e-12) → log10 → cepstral mean norm over time → cast
    (≡ modelling/audio.py:53-55, incl. the [..., :-1] frame drop)."""
    if drop_last_frame:
        mel = mel[..., :-1]
    logmel = jnp.log10(jnp.clip(mel, 1e-12, None))
    logmel = logmel - jnp.mean(logmel, axis=-1, keepdims=True)
    return logmel.astype(dtype)
