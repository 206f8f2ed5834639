"""Config-time validation (train/validate.py) + trainer-level context parallelism.

VERDICT r2 #3/#10: every unsupported flag/mesh/config combination must fail in <1 s
with an actionable message BEFORE any compile, and --attn_impl ring must be reachable
from the shipped CLI trainers (loss matching a dp-only run on the 8-device CPU sim).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from llama_x_tpu.models import llama
from llama_x_tpu.parallel import make_mesh
from llama_x_tpu.train.validate import LaunchConfigError, validate_launch, validate_model


def _args(**kw):
    base = dict(
        batch_size=8, gradient_accumulation=1, attn_impl="auto", mesh={},
        fused_ce_chunks=0, remat_policy="full", activation_checkpointing=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_ring_requires_cp_axis():
    mesh = make_mesh(dp=8)
    with pytest.raises(LaunchConfigError, match="cp"):
        validate_launch(_args(attn_impl="ring"), mesh)


def test_cp_axis_requires_ring():
    mesh = make_mesh(dp=4, cp=2)
    with pytest.raises(LaunchConfigError, match="ring"):
        validate_launch(_args(attn_impl="auto"), mesh)


def test_ring_rejects_pp():
    mesh = make_mesh(dp=2, cp=2, pp=2)
    with pytest.raises(LaunchConfigError, match="pp"):
        validate_launch(_args(attn_impl="ring"), mesh)


def test_ring_seq_len_divisibility():
    mesh = make_mesh(dp=1, fsdp=1, cp=8)
    with pytest.raises(LaunchConfigError, match="divide"):
        validate_launch(_args(attn_impl="ring"), mesh, max_seq_len=129)
    validate_launch(_args(attn_impl="ring"), mesh, max_seq_len=1024)  # ok


def test_batch_accum_divisibility():
    mesh = make_mesh(dp=8)
    with pytest.raises(LaunchConfigError, match="gradient_accumulation"):
        validate_launch(_args(batch_size=4, gradient_accumulation=3), mesh)


def test_ring_plus_dropout_rejected_before_compile():
    mesh = make_mesh(dp=4, cp=2)
    config = llama.tiny_config(attn_dropout=0.1, attn_impl="ring")
    with pytest.raises(LaunchConfigError, match="dropout"):
        validate_model(config, mesh, _args(attn_impl="ring"))


def test_pp_layer_divisibility():
    mesh = make_mesh(dp=2, pp=4)
    config = llama.tiny_config(num_layers=6)
    with pytest.raises(LaunchConfigError, match="num_layers"):
        validate_model(config, mesh, _args())


def test_tp_kv_head_divisibility():
    mesh = make_mesh(dp=2, tp=4)
    config = llama.tiny_config(num_kv_heads=2)
    with pytest.raises(LaunchConfigError, match="num_kv_heads"):
        validate_model(config, mesh, _args())


def test_ulysses_requires_cp_axis():
    mesh = make_mesh(dp=8)
    with pytest.raises(LaunchConfigError, match="cp"):
        validate_launch(_args(attn_impl="ulysses"), mesh)


def test_ulysses_head_divisibility():
    mesh = make_mesh(dp=1, fsdp=1, cp=8)
    config = llama.tiny_config(num_heads=4, num_kv_heads=2)  # 4 heads over cp=8
    with pytest.raises(LaunchConfigError, match="num_heads"):
        validate_model(config, mesh, _args(attn_impl="ulysses"))


def test_ulysses_gqa_geometry_rejected():
    mesh = make_mesh(dp=2, cp=4)
    # Hq=8 divides cp=4, but lcm(Hkv=3, 4) = 12 does not divide 8
    config = llama.tiny_config(num_heads=8, num_kv_heads=3)
    with pytest.raises(LaunchConfigError, match="head-scatter"):
        validate_model(config, mesh, _args(attn_impl="ulysses"))


# ---------------------------------------------------------------------------
# trainer-level context parallelism (VERDICT r2 #3)
# ---------------------------------------------------------------------------


def _run_trainer(monkeypatch, tmp_path, extra_argv, run_name):
    import train_metamathqa

    argv = [
        "train_metamathqa.py", "--synthetic", "32", "--n_steps", "2", "--batch_size", "8",
        "--max_seq_len", "256", "--seq_len_multiple", "128", "--log_interval", "1",
        "--ckpt_interval", "0", "--run_name", run_name, *extra_argv,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(tmp_path)
    train_metamathqa.main()
    run_dirs = sorted((tmp_path / "runs" / "metamathqa").glob(f"{run_name}_*"))
    assert run_dirs, "trainer produced no run dir"
    lines = (run_dirs[-1] / "metrics.jsonl").read_text().splitlines()
    return [json.loads(line) for line in lines]


def test_trainer_ring_cp_matches_dp(monkeypatch, tmp_path):
    """--attn_impl ring with a cp mesh axis runs end-to-end from the CLI trainer and
    its step-0 loss matches a dp-only run on identical data (8-device CPU sim)."""
    dp = _run_trainer(monkeypatch, tmp_path, ["--mesh", '{"dp": 8}'], "dponly")
    cp = _run_trainer(
        monkeypatch, tmp_path,
        ["--mesh", '{"dp": 4, "fsdp": 1, "cp": 2}', "--attn_impl", "ring"], "cprun",
    )
    l_dp, l_cp = dp[0]["loss"], cp[0]["loss"]
    assert np.isfinite(l_cp)
    assert abs(l_dp - l_cp) / max(abs(l_dp), 1e-9) < 3e-2, (l_dp, l_cp)


def test_trainer_ulysses_cp_matches_dp(monkeypatch, tmp_path):
    """--attn_impl ulysses (head-scatter CP) from the CLI trainer matches dp-only."""
    dp = _run_trainer(monkeypatch, tmp_path, ["--mesh", '{"dp": 8}'], "dponly2")
    uly = _run_trainer(
        monkeypatch, tmp_path,
        ["--mesh", '{"dp": 4, "fsdp": 1, "cp": 2}', "--attn_impl", "ulysses"], "ulyrun",
    )
    l_dp, l_uly = dp[0]["loss"], uly[0]["loss"]
    assert np.isfinite(l_uly)
    assert abs(l_dp - l_uly) / max(abs(l_dp), 1e-9) < 3e-2, (l_dp, l_uly)


def test_trainer_ring_without_cp_fails_fast(monkeypatch, tmp_path):
    import train_metamathqa

    argv = [
        "train_metamathqa.py", "--synthetic", "8", "--n_steps", "1", "--batch_size", "8",
        "--attn_impl", "ring",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(LaunchConfigError, match="cp"):
        train_metamathqa.main()
