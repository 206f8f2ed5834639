"""ctypes bindings for the native FLAC decoder (native/flacdec.cc).

The reference delegates FLAC decode to torchaudio's C++ backend
(train_librispeech.py:102); this framework ships its own dependency-free C++ decoder
and builds it on first use with the system g++ (cached next to the source). Pure-Python
decode of FLAC would be orders of magnitude too slow to feed a TPU step — the data
loader must keep ~150 audio-seconds/s of decode throughput per chip (bench.py).
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

def _build() -> Path:
    from llama_x_tpu.utils.native import build_native

    return build_native("flacdec.cc", "libflacdec.so")


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_build()))
    lib.flac_decode.restype = ctypes.c_longlong
    lib.flac_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def decode_flac(path_or_bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC file → (float32 mono-mixed waveform in [-1, 1], sample_rate)."""
    data = path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray)) else Path(path_or_bytes).read_bytes()
    lib = _lib()
    sr = ctypes.c_int(0)
    nch = ctypes.c_int(0)
    bps = ctypes.c_int(0)
    total = lib.flac_decode(bytes(data), len(data), None, 0, ctypes.byref(sr), ctypes.byref(nch), ctypes.byref(bps))
    if total < 0:
        raise ValueError("malformed FLAC stream")
    if total == 0:
        # STREAMINFO total_samples may legitimately be 0 (unknown) — start from a
        # compressed-size-based guess and let the decoder's -2 "buffer too small"
        # return grow it (compression means decoded samples exceed stored bits/bps)
        total = len(data) * 8 // max(bps.value, 1) + 65536
    while True:
        out = np.empty(int(total) * nch.value, np.int32)
        n = lib.flac_decode(
            bytes(data), len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), out.size,
            ctypes.byref(sr), ctypes.byref(nch), ctypes.byref(bps),
        )
        if n == -2:
            total = int(total) * 2
            continue
        break
    if n < 0:
        raise ValueError("malformed FLAC stream (frame decode)")
    x = out[: int(n) * nch.value].reshape(-1, nch.value).astype(np.float32)
    x /= float(2 ** (bps.value - 1))
    if nch.value > 1:
        x = x.mean(axis=1)
    else:
        x = x[:, 0]
    return x, sr.value


def flac_available() -> bool:
    try:
        _lib()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False
