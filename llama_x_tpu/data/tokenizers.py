"""Tokenizer registry (≡ llama_tokenizers.py).

- llama2: SentencePiece model from meta-llama/Llama-2-7b-chat-hf, bos=1 eos=2 pad=0
  (llama_tokenizers.py:14-27), read by the VENDORED pure-Python reader
  (data/sentencepiece.py) — works without the sentencepiece package; needs the
  tokenizer.model file (local --tokenizer_path, or hub when network allows).
- llama3: tiktoken BPE from Meta-Llama-3.1-8B-Instruct original/tokenizer.model with the
  Llama-3 split regex, bos=128000 eos=128001 pad=128004 (llama_tokenizers.py:31-61).
  Gated on the model file being reachable (hub download needs network).
- byte: offline byte-level tokenizer for tests/CI — 256 byte ids + bos/eos/pad specials.

All expose __call__(text, add_bos=False, add_eos=False) -> list[int] and decode().
"""

from __future__ import annotations


def get_tokenizer(name: str, model_path: str | None = None):
    try:
        factory = {
            "llama2": Llama2Tokenizer,
            "llama3": Llama3Tokenizer,
            "byte": ByteTokenizer,
        }[name]
    except KeyError:
        raise KeyError(f"unknown tokenizer {name!r}; choose from llama2/llama3/byte") from None
    return factory(model_path) if name != "byte" else factory()


class ByteTokenizer:
    """UTF-8 bytes as ids 0..255; specials above. Deterministic + offline."""

    bos_id = 256
    eos_id = 257
    pad_id = 258
    vocab_size = 259

    def __call__(self, text: str, add_bos: bool = False, add_eos: bool = False) -> list[int]:
        tokens = list(text.encode("utf-8"))
        if add_bos:
            tokens.insert(0, self.bos_id)
        if add_eos:
            tokens.append(self.eos_id)
        return tokens

    def decode(self, tokens: list[int]) -> str:
        return bytes(t for t in tokens if t < 256).decode("utf-8", errors="replace")


class Llama2Tokenizer:
    """SentencePiece-backed tokenizer via the vendored pure-Python reader
    (data/sentencepiece.py) — no sentencepiece package needed. Reads the standard
    tokenizer.model protobuf (BPE or unigram) with byte fallback."""

    bos_id = 1
    eos_id = 2
    pad_id = 0

    def __init__(self, model_path: str | None = None):
        from llama_x_tpu.data.sentencepiece import SentencePieceModel

        if model_path is None:
            try:
                from huggingface_hub import hf_hub_download

                model_path = hf_hub_download("meta-llama/Llama-2-7b-chat-hf", "tokenizer.model")
            except Exception as e:
                raise RuntimeError(
                    "llama2 tokenizer: no --tokenizer_path given and the hub download "
                    "failed (offline or gated repo). Download tokenizer.model from "
                    "meta-llama/Llama-2-7b-chat-hf and pass --tokenizer_path; or use "
                    "--tokenizer llama3/byte."
                ) from e
        self.sp = SentencePieceModel.from_file(model_path)
        self.vocab_size = len(self.sp)

    def __call__(self, text: str, add_bos: bool = False, add_eos: bool = False) -> list[int]:
        tokens = self.sp.encode(text)
        if add_bos:
            tokens.insert(0, self.bos_id)
        if add_eos:
            tokens.append(self.eos_id)
        return tokens

    def decode(self, tokens: list[int]) -> str:
        # control pieces (bos/eos) are skipped by the reader; pad==unk id 0 renders as
        # its piece text, matching callers that strip pads before decoding
        return self.sp.decode(tokens)


# the Llama-3 pretokenizer split pattern (public, from the Llama 3 release)
_LLAMA3_PAT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


class Llama3Tokenizer:
    bos_id = 128_000
    eos_id = 128_001
    pad_id = 128_004  # <|finetune_right_pad_id|>
    start_header_id = 128_006
    end_header_id = 128_007
    eot_id = 128_009  # end-of-turn: the chat-format stop token

    def __init__(self, model_path: str | None = None):
        import tiktoken
        from tiktoken.load import load_tiktoken_bpe

        if model_path is None:
            from huggingface_hub import hf_hub_download

            model_path = hf_hub_download("meta-llama/Meta-Llama-3.1-8B-Instruct", "original/tokenizer.model")
        self.enc = tiktoken.Encoding(
            "llama3",
            pat_str=_LLAMA3_PAT,
            mergeable_ranks=load_tiktoken_bpe(model_path),
            special_tokens={
                "<|begin_of_text|>": self.bos_id,
                "<|end_of_text|>": self.eos_id,
                "<|finetune_right_pad_id|>": self.pad_id,
                "<|start_header_id|>": self.start_header_id,
                "<|end_header_id|>": self.end_header_id,
                "<|eot_id|>": self.eot_id,
            },
        )

    def apply_chat_template(self, messages, add_generation_prompt: bool = True) -> list[int]:
        """The Llama-3 instruct chat format (public Meta spec): per message
        ``<|start_header_id|>role<|end_header_id|>\\n\\n{content}<|eot_id|>``, opened by
        bos and (for generation) closed with an empty assistant header. Generation
        should stop on ``eot_id``."""
        ids = [self.bos_id]
        for m in messages:
            ids += [self.start_header_id, *self.enc.encode(m["role"]), self.end_header_id]
            ids += self.enc.encode("\n\n" + m["content"].strip()) + [self.eot_id]
        if add_generation_prompt:
            ids += [self.start_header_id, *self.enc.encode("assistant"), self.end_header_id]
            ids += self.enc.encode("\n\n")
        return ids

    def __call__(self, text: str, add_bos: bool = False, add_eos: bool = False) -> list[int]:
        tokens = self.enc.encode(text, disallowed_special=())
        if add_bos:
            tokens.insert(0, self.bos_id)
        if add_eos:
            tokens.append(self.eos_id)
        return tokens

    def decode(self, tokens: list[int]) -> str:
        return self.enc.decode(tokens)
