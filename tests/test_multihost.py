"""Two-process multi-host training dryrun (DCN-shaped path, SURVEY §2.3):
jax.distributed init over two CPU processes + Gloo collectives, per-host shard
feeding, loss identical to a single-process run. The heavy lifting lives in
tools/dryrun_multihost.py; this wrapper keeps it in CI."""

import subprocess
import sys
from pathlib import Path


def test_two_process_dryrun_matches_single_process():
    script = Path(__file__).parent.parent / "tools" / "dryrun_multihost.py"
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "dryrun_multihost OK" in out.stdout, out.stdout
