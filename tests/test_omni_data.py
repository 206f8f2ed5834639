"""Omni (audio+image+text) data pipeline + trainer smoke (BASELINE config 5)."""

import json
import sys
import wave

import numpy as np
import pytest

from llama_x_tpu.data.tokenizers import ByteTokenizer


def _write_wav(path, samples, sr=16_000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype(np.int16).tobytes())


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


def _make_corpus(tmp_path, n=4, with_audio=True, with_image=True):
    rng = np.random.default_rng(0)
    records = []
    for i in range(n):
        rec = {"text": f"sample number {i}"}
        if with_audio:
            _write_wav(tmp_path / f"a{i}.wav", rng.standard_normal(8000) * 0.1)
            rec["audio"] = f"a{i}.wav"
        if with_image:
            _write_png(tmp_path / f"i{i}.png", rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
            rec["image"] = f"i{i}.png"
        records.append(rec)
    (tmp_path / "manifest.jsonl").write_text("\n".join(json.dumps(r) for r in records))


def test_omni_manifest_batches(tmp_path):
    from llama_x_tpu.data.omni import OmniManifest

    _make_corpus(tmp_path)
    ds = OmniManifest(
        str(tmp_path), ByteTokenizer(), audio_duration=1.0, image_size=32,
        seq_len_multiple=16, batch_size=2,
    )
    assert ds.has_audio and ds.has_image
    b = next(iter(ds))
    assert b["audio"].shape == (2, 16_000)
    assert b["images"].shape == (2, 32, 32, 3)
    n = int((b["labels"][0] != -100).sum())
    np.testing.assert_array_equal(b["labels"][0][:n], b["tokens"][0][1 : n + 1])


def test_omni_manifest_image_only(tmp_path):
    from llama_x_tpu.data.omni import OmniManifest

    _make_corpus(tmp_path, with_audio=False)
    ds = OmniManifest(str(tmp_path), ByteTokenizer(), image_size=32, batch_size=2, seq_len_multiple=16)
    b = next(iter(ds))
    assert "audio" not in b and b["images"].shape == (2, 32, 32, 3)


def test_omni_manifest_rejects_heterogeneous(tmp_path):
    from llama_x_tpu.data.omni import index_manifest

    _write_png(tmp_path / "i0.png", np.zeros((8, 8, 3), np.uint8))
    recs = [{"text": "a", "image": "i0.png"}, {"text": "b"}]
    (tmp_path / "manifest.jsonl").write_text("\n".join(json.dumps(r) for r in recs))
    with pytest.raises(AssertionError, match="heterogeneous"):
        index_manifest(tmp_path)


def test_omni_trainer_cli_smoke(monkeypatch, tmp_path):
    """train_omni.py --synthetic: both prefixes through the step, finite loss, vision
    and audio configs persisted for eval restore."""
    import train_omni

    argv = [
        "train_omni.py", "--synthetic", "16", "--n_steps", "3", "--batch_size", "8",
        "--audio_duration", "1", "--image_size", "32", "--patch_size", "8",
        "--seq_len_multiple", "32", "--prefix_lm",
        "--log_interval", "1", "--ckpt_interval", "0", "--run_name", "osmoke",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(tmp_path)
    train_omni.main()
    run_dir = sorted((tmp_path / "runs" / "omni").glob("osmoke_*"))[-1]
    rows = [json.loads(line) for line in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert all(np.isfinite(r["loss"]) for r in rows)
    cfg = json.loads((run_dir / "model_config.json").read_text())
    assert "audio" in cfg and "vision" in cfg


def _make_tiny_hf(ckpt_dir):
    """Fabricate a local tiny HF Llama checkpoint (vocab > ByteTokenizer's 259 ids) so
    the real-data trainer path (from_hf on a local dir) runs offline."""
    import torch

    D, L, NH, NKV, HD, F, V = 32, 2, 4, 2, 8, 64, 320
    rng = np.random.default_rng(7)

    def w(*shape):
        return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.05).to(torch.bfloat16)

    sd = {"model.embed_tokens.weight": w(V, D), "model.norm.weight": w(D), "lm_head.weight": w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = w(NH * HD, D)
        sd[p + "self_attn.k_proj.weight"] = w(NKV * HD, D)
        sd[p + "self_attn.v_proj.weight"] = w(NKV * HD, D)
        sd[p + "self_attn.o_proj.weight"] = w(D, NH * HD)
        sd[p + "mlp.gate_proj.weight"] = w(F, D)
        sd[p + "mlp.up_proj.weight"] = w(F, D)
        sd[p + "mlp.down_proj.weight"] = w(D, F)
        sd[p + "input_layernorm.weight"] = w(D)
        sd[p + "post_attention_layernorm.weight"] = w(D)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    (ckpt_dir / "config.json").write_text(
        json.dumps(
            {
                "architectures": ["LlamaForCausalLM"], "hidden_size": D, "num_hidden_layers": L,
                "head_dim": HD, "num_attention_heads": NH, "num_key_value_heads": NKV,
                "intermediate_size": F, "vocab_size": V, "rope_theta": 10000.0,
                "tie_word_embeddings": False,
            }
        )
    )
    torch.save(sd, str(ckpt_dir / "pytorch_model.bin"))


def test_omni_trainer_real_manifest(monkeypatch, tmp_path):
    """End-to-end with a real (fabricated) manifest corpus AND a local HF checkpoint:
    wav decode + png decode + tokenize + from_hf + train."""
    import train_omni

    data_dir = tmp_path / "corpus"
    data_dir.mkdir()
    _make_corpus(data_dir, n=6)
    _make_tiny_hf(tmp_path / "hf_ckpt")
    argv = [
        "train_omni.py", "--dataset_dir", str(data_dir), "--tokenizer", "byte",
        "--model", str(tmp_path / "hf_ckpt"),
        "--n_steps", "2", "--batch_size", "8",
        "--audio_duration", "1", "--image_size", "32", "--patch_size", "8",
        "--seq_len_multiple", "16", "--prefix_lm",
        "--log_interval", "1", "--ckpt_interval", "0", "--run_name", "oreal",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(tmp_path)
    train_omni.main()
    run_dir = sorted((tmp_path / "runs" / "omni").glob("oreal_*"))[-1]
    rows = [json.loads(line) for line in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert all(np.isfinite(r["loss"]) for r in rows)


def test_omni_trainer_pp_smoke(monkeypatch, tmp_path):
    """Omni under dp2 x pp4: both stem outputs concatenate into the stage-0 prefix."""
    import train_omni

    argv = [
        "train_omni.py", "--synthetic", "16", "--n_steps", "2", "--batch_size", "8",
        "--audio_duration", "1", "--image_size", "32", "--patch_size", "8",
        "--seq_len_multiple", "32", "--prefix_lm", "--mesh", '{"dp": 2, "pp": 4}',
        "--log_interval", "1", "--ckpt_interval", "0", "--run_name", "opp",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(tmp_path)
    train_omni.main()
    run_dir = sorted((tmp_path / "runs" / "omni").glob("opp_*"))[-1]
    rows = [json.loads(line) for line in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert all(np.isfinite(r["loss"]) for r in rows)
