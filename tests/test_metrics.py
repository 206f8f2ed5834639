"""Memory metrics honesty (VERDICT r2 weak #3): never log 0.0 placeholders — omit the
keys when the backend exposes nothing, and the compiler-estimate fallback reports a
real nonzero number."""

import jax
import jax.numpy as jnp

from llama_x_tpu.train.metrics import device_memory_stats, step_memory_analysis


def test_device_memory_stats_empty_backend(monkeypatch):
    class FakeDev:
        def memory_stats(self):
            return {}

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev()])
    assert device_memory_stats() == {}


def test_device_memory_stats_none_backend(monkeypatch):
    class FakeDev:
        def memory_stats(self):
            return None

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev()])
    assert device_memory_stats() == {}


def test_device_memory_stats_real_backend(monkeypatch):
    class FakeDev:
        def memory_stats(self):
            return {"bytes_in_use": 2_000_000_000, "peak_bytes_in_use": 3_000_000_000}

    monkeypatch.setattr(jax, "local_devices", lambda: [FakeDev()])
    out = device_memory_stats()
    assert out == {"memory_in_use_gb": 2.0, "peak_memory_gb": 3.0}


def test_step_memory_analysis_nonzero(tmp_path):
    from llama_x_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(str(tmp_path / "xla_cache"))

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((256, 256), jnp.float32)
    out = step_memory_analysis(f, x)
    # either the backend reports an analysis (then it must be > 0) or the helper
    # declines with {} — never a 0.0 placeholder
    if out:
        assert out["peak_memory_est_gb"] > 0


def test_trainer_logs_no_zero_memory(monkeypatch, tmp_path):
    """End-to-end: a synthetic trainer run's metrics.jsonl rows carry either no memory
    keys or nonzero values (the old code logged memory_in_use_gb: 0.0 on backends with
    empty memory_stats)."""
    import json
    import sys

    import train_metamathqa

    argv = [
        "train_metamathqa.py", "--synthetic", "16", "--n_steps", "2", "--batch_size", "8",
        "--max_seq_len", "256", "--log_interval", "1", "--ckpt_interval", "0",
        "--run_name", "memchk",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.chdir(tmp_path)
    train_metamathqa.main()
    run_dir = sorted((tmp_path / "runs" / "metamathqa").glob("memchk_*"))[-1]
    for line in (run_dir / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        for key in ("memory_in_use_gb", "peak_memory_gb", "peak_memory_est_gb"):
            if key in rec:
                assert rec[key] > 0, (key, rec)
