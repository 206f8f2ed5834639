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


@functools.partial(
    jax.jit, static_argnames=("n_fft", "win_length", "hop_length", "n_mels", "sample_rate", "impl")
)
def mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int = 16_000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
    impl: str = "auto",  # "auto" | "dft" | "fft"
) -> jnp.ndarray:
    """audio [B, T] float32 → mel power spectrogram [B, n_mels, 1 + T//hop].

    Two spectral backends:
    - "dft": the window is folded into precomputed cos/sin DFT bases and framing + rFFT
      become ONE strided convolution [B, T, 1] → [B, n_frames, 2·n_bins] — this is how a
      TPU wants to compute a 512-point hopped transform (MXU; both the strided-gather
      framing and XLA's generic FFT lowering are several times slower at these sizes:
      measured 15 ms gather + 9 ms FFT vs 5 ms conv for 40 s of 16 kHz audio on v5e).
    - "fft": XLA rFFT over gathered frames (oracle for tests; also the CPU default).
    """
    B, T = audio.shape
    pad = n_fft // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")

    n_frames = 1 + T // hop_length

    win = hann_window(win_length)
    lpad = (n_fft - win_length) // 2
    win_full = np.zeros(n_fft, np.float32)
    win_full[lpad : lpad + win_length] = win

    if impl == "auto":
        impl = "dft" if jax.default_backend() == "tpu" else "fft"

    fb = mel_filterbank(n_mels, n_fft, sample_rate)  # [n_mels, n_bins]

    if impl == "dft":
        n_bins = n_fft // 2 + 1
        k = np.arange(n_bins)[None, :]
        n = np.arange(n_fft)[:, None]
        ang = 2.0 * np.pi * n * k / n_fft
        # windowed DFT bases as conv kernels [W=n_fft, Cin=1, Cout=2*n_bins]
        basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1) * win_full[:, None]
        kern = jnp.asarray(basis.astype(np.float32)[:, None, :])
        y = jax.lax.conv_general_dilated(
            x[:, :, None],
            kern,
            window_strides=(hop_length,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, n_frames, 2*n_bins]
        re, im = y[..., :n_bins], y[..., n_bins:]
        power = re * re + im * im  # [B, n_frames, n_bins]
    else:
        # frame: [B, n_frames, n_fft] via strided gather
        idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
        frames = x[:, idx]
        spec = jnp.fft.rfft(frames * win_full[None, None, :], n_fft, axis=-1)
        power = jnp.square(spec.real) + jnp.square(spec.imag)

    mel = jnp.einsum("bfn,mn->bmf", power, fb, precision=jax.lax.Precision.HIGHEST)
    return mel


def log_mel_cmn(mel: jnp.ndarray, drop_last_frame: bool = True, dtype=jnp.bfloat16) -> jnp.ndarray:
    """clip(1e-12) → log10 → cepstral mean norm over time → cast
    (≡ modelling/audio.py:53-55, incl. the [..., :-1] frame drop)."""
    if drop_last_frame:
        mel = mel[..., :-1]
    logmel = jnp.log10(jnp.clip(mel, 1e-12, None))
    logmel = logmel - jnp.mean(logmel, axis=-1, keepdims=True)
    return logmel.astype(dtype)
