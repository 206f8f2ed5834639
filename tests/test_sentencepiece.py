"""Vendored SentencePiece reader (data/sentencepiece.py): protobuf parse, BPE
greedy-merge and unigram Viterbi encoding, byte fallback, normalizer handling.
Models are hand-emitted in protobuf wire format (sentencepiece is not installed;
the vendored reader exists exactly for that)."""

import struct

from llama_x_tpu.data.sentencepiece import BYTE, CONTROL, NORMAL, UNKNOWN, SentencePieceModel
from llama_x_tpu.data.tokenizers import Llama2Tokenizer, get_tokenizer


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def _field(num: int, wire: int, payload) -> bytes:
    key = _varint(num << 3 | wire)
    if wire == 0:
        return key + _varint(payload)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    if wire == 5:
        return key + payload  # caller packs 4 bytes
    raise ValueError(wire)


def _piece(text: str, score: float, typ: int = NORMAL) -> bytes:
    msg = _field(1, 2, text.encode("utf-8")) + _field(2, 5, struct.pack("<f", score))
    if typ != NORMAL:
        msg += _field(3, 0, typ)
    return _field(1, 2, msg)


def _model(pieces, model_type: int, add_dummy_prefix: bool = True) -> bytes:
    data = b"".join(_piece(*p) for p in pieces)
    data += _field(2, 2, _field(3, 0, model_type))  # TrainerSpec.model_type
    data += _field(3, 2, _field(3, 0, int(add_dummy_prefix)))  # NormalizerSpec.add_dummy_prefix
    return data


def _bpe_pieces():
    pieces = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL)]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    # merge chain h+e -> he -> hel -> hell -> hello -> ▁hello (score = merge priority)
    for text, score in [
        ("▁", -10.0), ("h", -11.0), ("e", -12.0), ("l", -13.0), ("o", -14.0),
        ("w", -15.0), ("r", -16.0), ("d", -17.0),
        ("he", -1.0), ("hel", -2.0), ("hell", -3.0), ("hello", -4.0), ("▁hello", -5.0),
        ("wo", -6.0), ("▁wo", -7.0),
    ]:
        pieces.append((text, score, NORMAL))
    return pieces


def test_bpe_merge_chain(tmp_path):
    p = tmp_path / "bpe.model"
    p.write_bytes(_model(_bpe_pieces(), model_type=2))
    sp = SentencePieceModel.from_file(p)
    assert sp.model_type == 2 and sp.add_dummy_prefix

    ids = sp.encode("hello")
    assert [sp.pieces[i].text for i in ids] == ["▁hello"]
    # merges apply left-to-right by score: wo merges before leftover chars
    ids = sp.encode("world")
    assert [sp.pieces[i].text for i in ids] == ["▁wo", "r", "l", "d"]
    assert sp.decode(sp.encode("hello world")) == "hello world"


def test_bpe_byte_fallback(tmp_path):
    p = tmp_path / "bpe.model"
    p.write_bytes(_model(_bpe_pieces(), model_type=2))
    sp = SentencePieceModel.from_file(p)
    ids = sp.encode("hq")  # q is not in the vocab -> its utf-8 byte piece
    texts = [sp.pieces[i].text for i in ids]
    assert "<0x71>" in texts
    assert sp.decode(ids) == "hq"
    # multi-byte char falls back to several byte pieces and round-trips
    ids = sp.encode("héllo")
    assert sp.decode(ids) == "héllo"


def test_unigram_viterbi(tmp_path):
    pieces = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL)]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [("▁ab", -1.0, NORMAL), ("▁a", -2.0, NORMAL), ("b", -2.5, NORMAL), ("▁", -3.0, NORMAL), ("a", -3.5, NORMAL)]
    p = tmp_path / "uni.model"
    p.write_bytes(_model(pieces, model_type=1))
    sp = SentencePieceModel.from_file(p)
    ids = sp.encode("ab")
    assert [sp.pieces[i].text for i in ids] == ["▁ab"]  # -1.0 beats ▁a+b (-4.5)
    assert sp.decode(sp.encode("ab ab")) == "ab ab"


def test_llama2_tokenizer_wrapper(tmp_path):
    p = tmp_path / "tok.model"
    p.write_bytes(_model(_bpe_pieces(), model_type=2))
    tok = get_tokenizer("llama2", str(p))
    assert isinstance(tok, Llama2Tokenizer)
    ids = tok("hello", add_bos=True, add_eos=True)
    assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
    assert tok.decode(ids) == "hello"  # control tokens skipped by the reader
    assert tok.vocab_size == len(_bpe_pieces())


def test_native_encoder_matches_python_fuzz():
    """The C++ encoder (native/spmenc.cc) must reproduce the pure-Python oracle
    byte-for-byte on both model types, including byte-fallback spans."""
    import random

    import pytest

    from llama_x_tpu.data import sentencepiece as sp

    if sp._native_lib() is None:
        pytest.skip("g++ unavailable: native encoder cannot build (python path still works)")

    random.seed(0)
    words = ["hello", "world", "the", "of", "and", "héllo", "日本", "a", "zz"]

    # unigram model with partial coverage (forces unk/byte-fallback paths)
    uni = [("<unk>", 0.0, UNKNOWN)]
    frags = {"▁hello", "▁world", "▁the", "▁of", "▁and", "▁a", "hel", "lo", "wor", "ld",
             "th", "e", "o", "f", "an", "d", "a", "▁", "h", "l", "w", "r", "n"}
    uni += [(t, -float(len(t)), NORMAL) for t in sorted(frags)]
    uni += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    m_uni = SentencePieceModel(_model(uni, model_type=1))

    m_bpe = SentencePieceModel(_model(_bpe_pieces(), model_type=2))

    # degenerate vocab: multiple UNKNOWN pieces (first must win, = python next(...)),
    # no byte pieces (unk fallback emits ONE id per uncovered span)
    multi_unk = [("<unk>", 0.0, UNKNOWN), ("<unk2>", 0.0, UNKNOWN),
                 ("▁a", -1.0, NORMAL), ("b", -2.0, NORMAL)]
    m_multi = SentencePieceModel(_model(multi_unk, model_type=1))

    for m in (m_uni, m_bpe, m_multi):
        lib, handle = m._native_handle()
        assert lib is not None, "native encoder failed to build"
        for _ in range(50):
            text = " ".join(random.choices(words, k=random.randint(1, 12)))
            native = m.encode(text)
            oracle = (m._encode_bpe if m.model_type == 2 else m._encode_unigram)(m._normalize(text))
            assert native == oracle, (text, native, oracle)
