"""Bounded-time TPU backend health probe with retries.

The tunneled axon backend (CLAUDE.md "Environment rules") has two observed failure
modes at first device contact:

  1. fast error:  RuntimeError "Unable to initialize backend 'axon': UNAVAILABLE"
  2. silent hang: a trivial matmul blocks for minutes and then dies

Round 3's driver bench (BENCH_r03.json rc=1) hit mode 1 and produced no JSON at all.
Neither mode can be bounded from inside the calling process (mode 2 blocks in C++),
so each probe runs a tiny matmul in a **subprocess** with a hard timeout, and the
caller retries with exponential backoff until a time budget is exhausted.

Success means: a fresh process created the backend, dispatched a 128x128 matmul and
pulled the result back through the tunnel — everything bench.py needs to exist.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE_SRC = """
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
print("PROBE_OK", float((x @ x)[0, 0]), jax.devices()[0].platform, flush=True)
"""


def probe_once(timeout_s: float = 90.0) -> tuple[bool, str]:
    """Run one bounded-time device probe in a subprocess. Returns (ok, detail)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s, env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return False, f"probe hung > {timeout_s:.0f}s (killed)"
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return True, r.stdout.strip().splitlines()[-1]
    tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
    return False, f"rc={r.returncode}: " + " | ".join(tail)


def wait_for_backend(
    budget_s: float = 600.0,
    probe_timeout_s: float = 90.0,
    log=print,
) -> dict:
    """Probe until healthy or the budget runs out (backoff 5s,15s,30s,60s,60s,...).

    Returns {"ok": bool, "attempts": int, "elapsed_s": float, "detail": str}.
    """
    t0 = time.monotonic()
    delays = [5.0, 15.0, 30.0, 60.0]
    attempt, detail = 0, ""
    while True:
        attempt += 1
        ok, detail = probe_once(probe_timeout_s)
        elapsed = time.monotonic() - t0
        if ok:
            log(f"[backend_probe] healthy after {attempt} attempt(s), {elapsed:.0f}s: {detail}",
                file=sys.stderr)
            return {"ok": True, "attempts": attempt, "elapsed_s": round(elapsed, 1), "detail": detail}
        delay = delays[min(attempt - 1, len(delays) - 1)]
        if elapsed + delay + probe_timeout_s > budget_s:
            log(f"[backend_probe] giving up after {attempt} attempt(s), {elapsed:.0f}s: {detail}",
                file=sys.stderr)
            return {"ok": False, "attempts": attempt, "elapsed_s": round(elapsed, 1), "detail": detail}
        log(f"[backend_probe] attempt {attempt} failed ({detail}); retrying in {delay:.0f}s",
            file=sys.stderr)
        time.sleep(delay)
