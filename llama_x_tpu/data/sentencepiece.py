"""Minimal pure-Python SentencePiece model reader + encoder.

The reference's llama2 tokenizer wraps the sentencepiece C++ library
(llama_tokenizers.py:14-27), which is not installed in this image. This module reads
the ``tokenizer.model`` protobuf directly (hand-rolled wire-format parse — no compiled
schema needed) and implements both encoding algorithms sentencepiece ships:

- BPE (Llama-2's model_type): greedy highest-score adjacent-pair merging over unicode
  symbols — the same algorithm the C++ library (and llama.cpp's SPM tokenizer) runs.
- Unigram (sentencepiece's default): Viterbi max-score segmentation.

Both honor the model's normalizer options we care about (add_dummy_prefix,
space→▁ escaping) and byte-fallback (<0xXX> pieces) for out-of-vocab characters.

ModelProto fields used (sentencepiece_model.proto, public schema):
  1: repeated SentencePiece { 1: piece (str), 2: score (float), 3: type (enum) }
  2: TrainerSpec { 3: model_type (1=UNIGRAM, 2=BPE) }
  3: NormalizerSpec { 3: add_dummy_prefix (bool) }
"""

from __future__ import annotations

import ctypes
import functools
import heapq
import struct
from dataclasses import dataclass

_SPACE = "▁"  # ▁

# ---------------------------------------------------------------------------
# native encoder (native/spmenc.cc) — the hot encode loop at C++ speed; the pure-
# Python implementations below stay as the semantics oracle (tests compare both)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _native_lib():
    """Build-on-first-use (shared helper with the FLAC decoder); None if unavailable."""
    try:
        from llama_x_tpu.utils.native import build_native

        lib = ctypes.CDLL(str(build_native("spmenc.cc", "libspmenc.so")))
        lib.spm_create.restype = ctypes.c_void_p
        lib.spm_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.spm_free.argtypes = [ctypes.c_void_p]
        for fn in (lib.spm_encode_unigram, lib.spm_encode_bpe):
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64,
            ]
        return lib
    except Exception:
        return None

# SentencePiece.Type values
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


# ---------------------------------------------------------------------------
# protobuf wire-format parsing
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a serialized message.
    value: int for varint/fixed, bytes for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wire == 1:  # fixed64
            val = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wire == 5:  # fixed32
            val = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


@dataclass
class Piece:
    text: str
    score: float
    type: int


class SentencePieceModel:
    """Parsed tokenizer.model: pieces + encode/decode."""

    def __init__(self, data: bytes):
        self.pieces: list[Piece] = []
        self.model_type = 1  # UNIGRAM default
        self.add_dummy_prefix = True
        for field, _, val in _fields(data):
            if field == 1:  # SentencePiece
                text, score, typ = "", 0.0, NORMAL
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        text = v2.decode("utf-8")
                    elif f2 == 2:
                        score = struct.unpack("<f", struct.pack("<I", v2))[0]
                    elif f2 == 3:
                        typ = v2
                self.pieces.append(Piece(text, score, typ))
            elif field == 2:  # TrainerSpec
                for f2, w2, v2 in _fields(val):
                    if f2 == 3 and w2 == 0:
                        self.model_type = v2
            elif field == 3:  # NormalizerSpec
                for f2, w2, v2 in _fields(val):
                    if f2 == 3 and w2 == 0:
                        self.add_dummy_prefix = bool(v2)

        self.piece_to_id = {p.text: i for i, p in enumerate(self.pieces)}
        self.unk_id = next((i for i, p in enumerate(self.pieces) if p.type == UNKNOWN), 0)
        self._byte_ids = {
            int(p.text[3:5], 16): i for i, p in enumerate(self.pieces) if p.type == BYTE
        }
        self._max_piece_len = max((len(p.text) for p in self.pieces), default=1)
        self._unk_penalty = min((p.score for p in self.pieces if p.type == NORMAL), default=-10.0) - 10.0
        self._native = None  # lazily-created native handle (see _native_handle)

    def _native_handle(self):
        """ctypes handle to the C++ encoder, or None (falls back to pure Python)."""
        if self._native is None:
            lib = _native_lib()
            if lib is None:
                self._native = (None, None)
            else:
                parts = [struct.pack("<I", len(self.pieces))]
                for p in self.pieces:
                    raw = p.text.encode("utf-8")
                    parts.append(struct.pack("<fBI", p.score, p.type, len(raw)) + raw)
                blob = b"".join(parts)
                self._native = (lib, lib.spm_create(blob, len(blob)))
        return self._native

    def __del__(self):
        native = getattr(self, "_native", None)
        if native and native[0] is not None:
            native[0].spm_free(native[1])

    @classmethod
    def from_file(cls, path: str) -> "SentencePieceModel":
        with open(path, "rb") as f:
            return cls(f.read())

    def __len__(self):
        return len(self.pieces)

    # -- encoding ------------------------------------------------------------

    def _normalize(self, text: str) -> str:
        if self.add_dummy_prefix and not text.startswith(" "):
            text = " " + text
        return text.replace(" ", _SPACE)

    def _byte_fallback(self, sym: str) -> list[int]:
        ids = []
        for b in sym.encode("utf-8"):
            ids.append(self._byte_ids.get(b, self.unk_id))
        return ids if self._byte_ids else [self.unk_id]

    def encode(self, text: str) -> list[int]:
        if not text:
            return []
        norm = self._normalize(text)
        lib, handle = self._native_handle()
        if lib is not None:
            raw = norm.encode("utf-8")
            cap = len(raw) + 8
            out = (ctypes.c_int32 * cap)()
            fn = lib.spm_encode_bpe if self.model_type == 2 else lib.spm_encode_unigram
            n = fn(handle, raw, len(raw), out, cap)
            if n >= 0:
                return list(out[:n])
        if self.model_type == 2:  # BPE
            return self._encode_bpe(norm)
        return self._encode_unigram(norm)

    def _encode_bpe(self, norm: str) -> list[int]:
        """Greedy highest-score adjacent merges (the sentencepiece BPE semantics:
        scores encode merge priority, higher merges first; position breaks ties)."""
        # doubly-linked symbol list over unicode characters
        syms = [[c, i - 1, i + 1, True] for i, c in enumerate(norm)]  # text, prev, next, alive

        def pair_score(i: int):
            j = syms[i][2]
            if j >= len(syms):
                return None
            merged = syms[i][0] + syms[j][0]
            idx = self.piece_to_id.get(merged)
            if idx is None or self.pieces[idx].type not in (NORMAL, USER_DEFINED):
                return None
            return (-self.pieces[idx].score, i, merged)

        heap = []
        for i in range(len(syms) - 1):
            item = pair_score(i)
            if item:
                heapq.heappush(heap, item)
        while heap:
            negscore, i, merged = heapq.heappop(heap)
            j = syms[i][2]
            # stale entry: either symbol merged away or texts changed since push
            if not syms[i][3] or j >= len(syms) or not syms[j][3] or syms[i][0] + syms[j][0] != merged:
                continue
            syms[i][0] = merged
            syms[j][3] = False
            syms[i][2] = syms[j][2]
            if syms[i][2] < len(syms):
                syms[syms[i][2]][1] = i
            for cand in (pair_score(syms[i][1]) if syms[i][1] >= 0 else None, pair_score(i)):
                if cand:
                    heapq.heappush(heap, cand)

        ids: list[int] = []
        for text, _, _, alive in syms:
            if not alive:
                continue
            idx = self.piece_to_id.get(text)
            if idx is not None and self.pieces[idx].type != UNUSED:
                ids.append(idx)
            else:
                ids.extend(self._byte_fallback(text))
        return ids

    def _encode_unigram(self, norm: str) -> list[int]:
        """Viterbi max-total-score segmentation with byte-fallback for uncovered
        characters (unk penalty keeps known pieces preferred)."""
        n = len(norm)
        NEG = -1e18
        best = [NEG] * (n + 1)
        back: list[tuple[int, int | None]] = [(0, None)] * (n + 1)
        best[0] = 0.0
        unk_penalty = self._unk_penalty  # precomputed: O(vocab) scan does not belong per call
        for i in range(n):
            if best[i] == NEG:
                continue
            for ln in range(1, min(self._max_piece_len, n - i) + 1):
                piece = norm[i : i + ln]
                idx = self.piece_to_id.get(piece)
                if idx is None or self.pieces[idx].type not in (NORMAL, USER_DEFINED):
                    continue
                s = best[i] + self.pieces[idx].score
                if s > best[i + ln]:
                    best[i + ln] = s
                    back[i + ln] = (i, idx)
            # unk single char (byte-fallback at emit time)
            s = best[i] + unk_penalty
            if s > best[i + 1]:
                best[i + 1] = s
                back[i + 1] = (i, None)
        ids_rev: list[int] = []
        pos = n
        while pos > 0:
            start, idx = back[pos]
            if idx is None:
                ids_rev.extend(reversed(self._byte_fallback(norm[start:pos])))
            else:
                ids_rev.append(idx)
            pos = start
        return ids_rev[::-1]

    # -- decoding ------------------------------------------------------------

    def decode(self, ids: list[int]) -> str:
        out: list[bytes] = []
        for i in ids:
            if not 0 <= i < len(self.pieces):
                continue
            p = self.pieces[i]
            if p.type == BYTE:
                out.append(bytes([int(p.text[3:5], 16)]))
            elif p.type in (NORMAL, USER_DEFINED, UNKNOWN):
                out.append(p.text.encode("utf-8"))
        text = b"".join(out).decode("utf-8", errors="replace").replace(_SPACE, " ")
        if self.add_dummy_prefix and text.startswith(" "):
            text = text[1:]
        return text
