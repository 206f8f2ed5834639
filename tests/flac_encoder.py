"""Minimal FLAC *encoder* used only as a test fixture for the native decoder.

Emits spec-conformant streams with CONSTANT / VERBATIM / FIXED(0-2) subframes and
rice-coded residuals (method 0, partition order 0) — enough to exercise the decoder's
bit-reader, unary/rice paths, fixed predictors, and frame plumbing. CRCs are written as
zeros (the decoder does not verify them). Mono/stereo-independent, 16-bit.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _rice_encode(bw: BitWriter, residual: np.ndarray, k: int):
    bw.write(0, 2)  # method 0 (4-bit rice params)
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    for r in residual:
        u = (abs(int(r)) << 1) - (1 if int(r) < 0 else 0)  # zigzag: 2|r| - (r<0)
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


_FIXED = {0: [], 1: [1], 2: [2, -1]}


def _encode_subframe(bw: BitWriter, x: np.ndarray, bps: int, mode: str):
    bw.write(0, 1)  # padding
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif mode == "lpc2":
        # LPC order 2, quantized coefficients ~[1.7, -0.75], shift 10, precision 12
        order, precision, shift = 2, 12, 10
        coef = [int(1.7 * (1 << shift)), int(-0.75 * (1 << shift))]
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(c, precision)
        xi = x.astype(np.int64)
        pred = (coef[0] * xi[1:-1] + coef[1] * xi[:-2]) >> shift
        res = xi[2:] - pred
        mean = max(float(np.mean(np.abs(res))), 1.0)
        k = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
        _rice_encode(bw, res, k)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        res = x.astype(np.int64).copy()
        for _ in range(order):
            res = np.diff(res)
        res = res  # after `order` diffs, res[i] aligns with x[order + i]
        mean = max(float(np.mean(np.abs(res))), 1.0)
        k = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
        _rice_encode(bw, res, k)
    else:
        raise ValueError(mode)


def encode_flac(
    x: np.ndarray,
    sample_rate: int = 16_000,
    bps: int = 16,
    blocksize: int = 1024,
    mode: str = "fixed2",
) -> bytes:
    """x: int array [T] (mono) or [T, C] in [-2^(bps-1), 2^(bps-1))."""
    if x.ndim == 1:
        x = x[:, None]
    T, C = x.shape

    # ---- STREAMINFO ----
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(C - 1, 3)
    si.write(bps - 1, 5)
    si.write(T, 36)
    si_bytes = si.tobytes() + b"\x00" * 16  # md5 = 0
    header = b"fLaC" + bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    # ---- frames ----
    out = bytearray(header)
    frame_idx = 0
    for start in range(0, T, blocksize):
        blk = x[start : start + blocksize]
        n = blk.shape[0]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        if n == blocksize and blocksize in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code = 8 + int(np.log2(blocksize)) - 8
            bw.write(bs_code, 4)
            explicit_bs = None
        else:
            bw.write(7, 4)  # 16-bit blocksize - 1 follows
            explicit_bs = n - 1
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(C - 1, 4)  # independent channels
        bw.write(4, 3)  # 16 bps
        bw.write(0, 1)
        assert frame_idx < 128
        bw.write(frame_idx, 8)  # utf8 single byte
        if explicit_bs is not None:
            bw.write(explicit_bs, 16)
        bw.write(0, 8)  # CRC-8 (unchecked by our decoder)
        for c in range(C):
            ch = blk[:, c]
            order = int(mode[-1]) if (mode.startswith("fixed") or mode.startswith("lpc")) else 0
            m = mode if n > order else "verbatim"
            if mode == "constant":
                ch = np.full(n, ch[0], ch.dtype)  # constant requires a constant signal
            _encode_subframe(bw, ch, bps, m)
        bw.align()
        bw.write(0, 16)  # CRC-16 (unchecked)
        out += bw.tobytes()
        frame_idx += 1
    return bytes(out)
