#!/usr/bin/env python
"""Serial TPU artifact backlog driver.

Replaces the accumulated one-shot ``tools/tpu_backlog{,2..7}.sh`` scripts (one
was minted per tunnel-outage window in rounds 3-4) with a single parameterized
driver reading a manifest of pending artifacts.

Manifest (``tools/backlog_manifest.json``): a JSON list of steps

    {"name": "bench_headline",          # log name, --only key
     "cmd": "python bench.py",          # shell command, run from /root/repo
     "timeout_s": 5400,                 # hard bound per attempt
     "done": "BENCH_r04.json",          # artifact path; exists+non-empty => skip
     "after": "train_spec_target"}      # optional: skip unless that step is done

Behavior (same contract the shell scripts had):
  * gate every pass on a bounded backend-health probe
    (llama_x_tpu.utils.backend_probe.wait_for_backend);
  * run pending steps serially, each under ``timeout``; a failure (flaky remote
    compile, tunnel drop) logs rc and moves on so one bad dispatch doesn't
    strand the rest;
  * ``--watch`` retries the whole queue until everything is done or the
    deadline passes (folds in the old tools/tpu_watch.sh);
  * logs under /tmp/backlog/<step>.log with a driver.log summary.

usage:
  python tools/tpu_backlog.py --list                 # show pending/done
  python tools/tpu_backlog.py                        # one pass over pending
  python tools/tpu_backlog.py --only bench_headline  # single step, even if done
  nohup python tools/tpu_backlog.py --watch > /dev/null 2>&1 &
  echo $! > /tmp/backlog.pid                         # bounded kill handle
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_MANIFEST = REPO / "tools" / "backlog_manifest.json"
LOG_DIR = Path(os.environ.get("BACKLOG_LOG", "/tmp/backlog"))

PROBE_SNIPPET = (
    "from llama_x_tpu.utils.backend_probe import wait_for_backend\n"
    "import sys; res = wait_for_backend(budget_s=600)\n"
    "sys.exit(0 if res['ok'] else 1)\n"
)


def now() -> str:
    return time.strftime("%H:%M:%S")


def log(msg: str) -> None:
    line = f"{msg} {now()}"
    print(line, flush=True)
    with open(LOG_DIR / "driver.log", "a") as f:
        f.write(line + "\n")


def load_manifest(path: Path) -> list[dict]:
    steps = json.loads(path.read_text())
    names = [s["name"] for s in steps]
    assert len(names) == len(set(names)), f"duplicate step names in {path}"
    return steps


def is_done(step: dict) -> bool:
    done = step.get("done")
    if not done:
        return False
    p = REPO / done
    return p.exists() and p.stat().st_size > 0


def probe_backend(env: dict) -> bool:
    r = subprocess.run(
        ["timeout", "720", sys.executable, "-c", PROBE_SNIPPET],
        cwd=REPO, env=env,
        stdout=open(LOG_DIR / "probe.log", "ab"),
        stderr=subprocess.STDOUT,
    )
    return r.returncode == 0


def run_step(step: dict, env: dict) -> int:
    name = step["name"]
    log(f"=== {name} start")
    with open(LOG_DIR / f"{name}.log", "ab") as out:
        r = subprocess.run(
            ["timeout", str(step.get("timeout_s", 3600)), "bash", "-c", step["cmd"]],
            cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT,
        )
    log(f"=== {name} rc={r.returncode}")
    return r.returncode


def one_pass(steps: list[dict], env: dict, force: set[str]) -> tuple[int, int]:
    """Run all runnable pending steps once. Returns (n_run, n_pending_after)."""
    done_names = {s["name"] for s in steps if is_done(s)}
    pending = [s for s in steps if s["name"] not in done_names or s["name"] in force]
    if not pending:
        return 0, 0
    if not probe_backend(env):
        log("BACKEND DOWN — pass aborted")
        return 0, len(pending)
    log("=== probe ok")
    n_run = 0
    for step in pending:
        after = step.get("after")
        if after and after not in done_names:
            log(f"--- {step['name']} skipped (needs {after})")
            continue
        run_step(step, env)
        n_run += 1
        if is_done(step):
            done_names.add(step["name"])
    still = [s for s in steps if not is_done(s)]
    return n_run, len(still)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", type=Path, default=DEFAULT_MANIFEST)
    ap.add_argument("--only", action="append", default=[],
                    help="run just these steps (repeatable); ignores done-check")
    ap.add_argument("--list", action="store_true", help="show step status and exit")
    ap.add_argument("--watch", action="store_true",
                    help="retry passes until all done or --deadline_s elapses")
    ap.add_argument("--deadline_s", type=int, default=39600)
    args = ap.parse_args()

    LOG_DIR.mkdir(parents=True, exist_ok=True)
    steps = load_manifest(args.manifest)

    if args.list:
        for s in steps:
            mark = "done   " if is_done(s) else "PENDING"
            print(f"{mark} {s['name']:<24} -> {s.get('done', '(no artifact)')}")
        return 0

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + str(REPO)

    if args.only:
        known = {s["name"]: s for s in steps}
        missing = [n for n in args.only if n not in known]
        if missing:
            print(f"unknown step(s): {missing}", file=sys.stderr)
            return 2
        if not probe_backend(env):
            log("BACKEND DOWN — aborting")
            return 1
        rc = 0
        for n in args.only:
            rc |= run_step(known[n], env)
        return rc

    deadline = time.time() + args.deadline_s
    while True:
        n_run, n_pending = one_pass(steps, env, force=set())
        if n_pending == 0:
            log("BACKLOG DONE")
            return 0
        if not args.watch or time.time() > deadline:
            log(f"pass complete, {n_pending} pending (watch={args.watch})")
            return 1
        log(f"watch: {n_pending} pending, retry in 300s")
        time.sleep(300)


if __name__ == "__main__":
    sys.exit(main())
