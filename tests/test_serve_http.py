"""tools/serve_http.py: the HTTP serving front-end must answer /health and
/v1/completions (single + ragged-batch prompts) through the production generate()
path, against a real training-run checkpoint."""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import pytest

RUN_DIR = Path(__file__).resolve().parent.parent / "runs/metamathqa/run_20260816_204350"


@pytest.mark.skipif(not RUN_DIR.exists(), reason="checkpoint run dir not present")
def test_serve_http_completions():
    port = 8123
    repo = RUN_DIR.parent.parent.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = f"{env.get('PYTHONPATH', '')}:{repo}".lstrip(":")
    env.pop("XLA_FLAGS", None)  # no need for the 8-device sim in the subprocess
    proc = subprocess.Popen(
        [sys.executable, "tools/serve_http.py", "--resume", str(RUN_DIR),
         "--tokenizer", "byte", "--port", str(port)],
        cwd=repo, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
    )
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):  # model restore can take a bit
            try:
                health = json.load(urllib.request.urlopen(f"{base}/health", timeout=2))
                break
            except Exception:
                assert proc.poll() is None, proc.stderr.read().decode()[-2000:]
                time.sleep(1)
        else:
            raise AssertionError("server never became healthy")
        assert health["status"] == "ok"

        def post(payload):
            req = urllib.request.Request(
                f"{base}/v1/completions", json.dumps(payload).encode(),
                {"Content-Type": "application/json"},
            )
            try:
                return json.load(urllib.request.urlopen(req, timeout=240))
            except urllib.error.HTTPError as e:  # 400s carry a JSON error body
                return json.load(e)

        one = post({"prompt": "2+2=", "max_tokens": 6})
        assert len(one["choices"]) == 1 and one["usage"]["completion_tokens"] >= 1

        batch = post({"prompt": ["2+2=", "a longer prompt here"], "max_tokens": 6,
                      "temperature": 0.5})
        assert len(batch["choices"]) == 2
        assert [c["index"] for c in batch["choices"]] == [0, 1]

        multi = post({"prompt": "2+2=", "max_tokens": 6, "n": 2, "temperature": 0.9})
        assert len(multi["choices"]) == 2

        stopped = post({"prompt": "2+2=", "max_tokens": 6, "stop": ["\x00"]})
        assert len(stopped["choices"]) == 1  # stop trimming must not error

        err = post({"max_tokens": 4})
        assert "error" in err
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=10)
