"""tools/serve_http.py: the HTTP serving front-end must answer /health and
/v1/completions (single + ragged-batch prompts) through the production generate()
path, against a real training-run checkpoint; the Engine's coalescing queue must
batch concurrent requests, keep compiled shapes bucketed, report finish_reason
faithfully, and serve speculatively when a draft is loaded."""

import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A self-contained tiny run dir (model_config.json + checkpoint) so the
    subprocess server test does not depend on leftover training runs (checkpoint
    blobs are untracked; only configs survive in git)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_x_tpu.models import llama
    from llama_x_tpu.train.checkpoint import save_checkpoint

    d = tmp_path_factory.mktemp("serve_run")
    config = llama.tiny_config(max_seq_len=256, vocab_size=512, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    (d / "model_config.json").write_text(
        json.dumps({"llama": dataclasses.asdict(config)})
    )
    save_checkpoint(d, {"step": np.int64(0), "params": params}, 0)
    return d


def _tiny_engine(monkeypatch=None, draft=False, extra_args=(), vocab=512):
    import jax
    import jax.numpy as jnp

    from llama_x_tpu.models import llama
    from serve_http import Engine, build_parser

    config = llama.tiny_config(max_seq_len=128, vocab_size=vocab, attn_impl="xla")
    params = llama.init(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    args = build_parser().parse_args([
        "--model", "unused", "--tokenizer", "byte",
        "--prompt_multiple", "16", "--tokens_multiple", "8",
        "--batch_window_ms", "300", *extra_args,
    ])
    pre_draft = None
    if draft:
        dconfig = llama.tiny_config(max_seq_len=128, vocab_size=vocab, num_layers=1,
                                    embed_dim=32, num_heads=2, num_kv_heads=2,
                                    head_dim=16, intermediate_dim=64, attn_impl="xla")
        dparams = llama.init(jax.random.PRNGKey(1), dconfig, dtype=jnp.float32)
        pre_draft = (dparams, dconfig)
    return Engine(args, _preloaded=(params, config), _preloaded_draft=pre_draft)


def test_engine_coalesces_concurrent_requests():
    """Two requests arriving within the batching window must share ONE generate()
    call (one compiled ragged batch) and each get its own rows back."""
    eng = _tiny_engine()
    results = {}

    def go(name, prompt, mt):
        results[name] = eng.complete([prompt], max_tokens=mt, temperature=0.0,
                                     top_k=0, top_p=1.0, min_p=0.0)

    t1 = threading.Thread(target=go, args=("a", "hello", 6))
    t2 = threading.Thread(target=go, args=("b", "a much longer prompt", 6))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert eng.generate_calls == 1, "concurrent requests must coalesce into one batch"
    assert len(results["a"][0]) == 1 and len(results["b"][0]) == 1
    # row identity: coalesced output must equal a solo run of the same prompt (greedy)
    solo = eng.complete(["hello"], max_tokens=6, temperature=0.0, top_k=0, top_p=1.0)
    assert solo[0] == results["a"][0]


def test_engine_buckets_compiled_shapes():
    """Different prompt lengths / max_tokens inside a bucket must produce IDENTICAL
    compiled shapes (prompt_multiple / tokens_multiple / pow2 batch)."""
    import importlib

    gen_mod = importlib.import_module("llama_x_tpu.models.generate")
    eng = _tiny_engine(extra_args=("--decode_chunk", "0"))  # spy targets generate()
    shapes = []
    orig = gen_mod.generate

    def spy(params, config, prompt, **kw):
        shapes.append((prompt.shape, kw["max_new_tokens"]))
        return orig(params, config, prompt, **kw)

    gen_mod.generate = spy
    try:
        eng.complete(["hi"], max_tokens=3, temperature=0.0, top_k=0, top_p=1.0)
        eng.complete(["a longer one"], max_tokens=7, temperature=0.0, top_k=0, top_p=1.0)
    finally:
        gen_mod.generate = orig
    assert shapes[0] == shapes[1], shapes


def test_engine_finish_reason():
    """'stop' iff the model emitted eos inside the requested window; 'length'
    otherwise — including completions that emitted tokens (the round-3 inversion)."""
    import importlib

    import numpy as np

    gen_mod = importlib.import_module("llama_x_tpu.models.generate")
    eng = _tiny_engine(extra_args=("--decode_chunk", "0"))  # spy targets generate()
    eos = eng.tok.eos_id
    orig = gen_mod.generate

    def fake(params, config, prompt, *, max_new_tokens, **kw):
        out = np.full((prompt.shape[0], max_new_tokens), 65, np.int32)
        out[0, 2] = eos  # row 0 stops at its 3rd token
        out[0, 3:] = eng.tok.pad_id
        return out

    gen_mod.generate = fake
    try:
        texts, counts, reasons = eng.complete(
            ["stops early", "runs to length"], max_tokens=6,
            temperature=0.0, top_k=0, top_p=1.0,
        )
    finally:
        gen_mod.generate = orig
    assert reasons == ["stop", "length"], reasons
    assert counts[0] == 2 and counts[1] == 6


def test_engine_speculative_serving_matches_plain():
    """--draft serving: greedy speculative output through the Engine equals the plain
    Engine's greedy output (speculative preserves the target's trajectory)."""
    plain = _tiny_engine()
    spec = _tiny_engine(draft=True, extra_args=("--gamma", "3"))
    assert spec.draft_params is not None
    p = ["speculative decoding"]
    want = plain.complete(p, max_tokens=10, temperature=0.0, top_k=0, top_p=1.0)
    got = spec.complete(p, max_tokens=10, temperature=0.0, top_k=0, top_p=1.0)
    assert got[0] == want[0], (got[0], want[0])


def test_engine_chunked_matches_oneshot():
    """The default chunked decode path (early-exit + streaming capable) must produce
    the same greedy text as the one-shot fused generate() path."""
    oneshot = _tiny_engine(extra_args=("--decode_chunk", "0"))
    chunked = _tiny_engine(extra_args=("--decode_chunk", "4"))
    p = ["chunked decoding parity"]
    want = oneshot.complete(p, max_tokens=11, temperature=0.0, top_k=0, top_p=1.0)
    got = chunked.complete(p, max_tokens=11, temperature=0.0, top_k=0, top_p=1.0)
    assert got[0] == want[0] and got[2] == want[2], (got, want)


def test_engine_continuous_matches_oneshot():
    """--continuous N (slot scheduler): greedy texts/counts/reasons must equal the
    one-shot fused path for a multi-prompt request."""
    oneshot = _tiny_engine(extra_args=("--decode_chunk", "0"))
    cont = _tiny_engine(extra_args=("--continuous", "2", "--decode_chunk", "4"))
    p = ["continuous batching", "a second, longer prompt to batch"]
    want = oneshot.complete(p, max_tokens=9, temperature=0.0, top_k=0, top_p=1.0)
    got = cont.complete(p, max_tokens=9, temperature=0.0, top_k=0, top_p=1.0)
    assert got == want, (got, want)


def test_engine_continuous_late_join_streams():
    """A request submitted while another is mid-decode joins the running batch (no
    waiting for the first to finish) and both match their solo outputs; the first
    request's SSE deltas concatenate to its final text."""
    import queue

    eng = _tiny_engine(extra_args=("--continuous", "2", "--decode_chunk", "2"))
    q: queue.Queue = queue.Queue()
    ra = eng.submit([eng.tok("streaming row", add_bos=True)], max_tokens=14,
                    temperature=0.0, top_k=0, top_p=1.0, stream_q=q)
    first = q.get(timeout=300)  # A is mid-decode now
    rb = eng.submit([eng.tok("late joiner", add_bos=True)], max_tokens=6,
                    temperature=0.0, top_k=0, top_p=1.0)
    assert rb.event.wait(timeout=300) and rb.error is None
    assert ra.event.wait(timeout=300) and ra.error is None
    pieces = "".join(first)
    while True:
        d = q.get(timeout=60)
        if d is None:
            break
        pieces += "".join(d)
    assert pieces == ra.texts[0]
    solo = eng.complete(["late joiner"], max_tokens=6, temperature=0.0, top_k=0, top_p=1.0)
    assert solo[0] == rb.texts and rb.reasons[0] in ("stop", "length")


def test_engine_streaming_deltas_concatenate_to_final():
    """submit(stream_q=...): per-chunk text deltas, a None sentinel, and the final
    texts/reasons on the request; concatenated deltas == final text."""
    import queue

    eng = _tiny_engine(extra_args=("--decode_chunk", "3"))
    q: queue.Queue = queue.Queue()
    req = eng.submit([eng.tok("streaming test", add_bos=True)], max_tokens=10,
                     temperature=0.0, top_k=0, top_p=1.0, stream_q=q)
    pieces = []
    while True:
        deltas = q.get(timeout=120)
        if deltas is None:
            break
        assert len(deltas) == 1
        pieces.append(deltas[0])
    req.event.wait()
    assert req.error is None
    assert len(pieces) >= 2, "chunk_size 3 over 10 tokens must yield several deltas"
    assert "".join(pieces) == req.texts[0]
    assert req.reasons[0] in ("stop", "length")


def test_engine_chunked_early_exit_skips_decode_chunks():
    """Once every row hits eos, remaining decode chunks must NOT run (the whole point
    of chunked serving: max_tokens=64 with eos at token 2 stops paying for 64)."""
    import importlib

    gen_mod = importlib.import_module("llama_x_tpu.models.generate")
    eng = _tiny_engine(extra_args=("--decode_chunk", "4", "--tokens_multiple", "64"))
    # learn the first two greedy token ids, then declare the second one "eos"
    text0 = eng.complete(["early exit"], max_tokens=2, temperature=0.0, top_k=0, top_p=1.0)[0][0]
    eos_id = eng.tok(text0)[-1]

    calls = []
    orig = gen_mod.decode_chunk

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    gen_mod.decode_chunk = spy
    try:
        req = eng.submit([eng.tok("early exit", add_bos=True)], max_tokens=64,
                         temperature=0.0, top_k=0, top_p=1.0, eos_id=eos_id)
        req.event.wait()
    finally:
        gen_mod.decode_chunk = orig
    assert req.error is None
    assert req.reasons[0] == "stop"
    # 64 tokens / chunk 4 = 16 chunks if it ran to length; eos at token 2 stops after 1
    assert len(calls) <= 2, f"early exit failed: {len(calls)} chunks ran"


def test_engine_chat_fallback_template_and_eos():
    """Byte tokenizer: encode_chat builds the role-prefixed transcript and chat eos
    falls back to the tokenizer eos."""
    eng = _tiny_engine()
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    ids = eng.encode_chat(msgs)
    assert ids[0] == eng.tok.bos_id
    assert eng.tok.decode(ids[1:]) == "system: be brief\nuser: hi\nassistant:"
    assert eng.chat_eos_id == eng.tok.eos_id
    req = eng.submit([ids], max_tokens=6, temperature=0.0, top_k=0, top_p=1.0,
                     eos_id=eng.chat_eos_id)
    req.event.wait()
    assert req.error is None and isinstance(req.texts[0], str)


def test_serve_http_completions(run_dir):
    port = 8123
    repo = REPO
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = f"{env.get('PYTHONPATH', '')}:{repo}".lstrip(":")
    env.pop("XLA_FLAGS", None)  # no need for the 8-device sim in the subprocess
    proc = subprocess.Popen(
        [sys.executable, "tools/serve_http.py", "--resume", str(run_dir),
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

        def post(payload, path="/v1/completions"):
            req = urllib.request.Request(
                f"{base}{path}", json.dumps(payload).encode(),
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

        chat = post({"messages": [{"role": "user", "content": "hello"}],
                     "max_tokens": 6}, path="/v1/chat/completions")
        assert chat["choices"][0]["message"]["role"] == "assistant"
        assert chat["choices"][0]["finish_reason"] in ("stop", "length")

        # SSE streaming: text/event-stream, delta events, [DONE] terminator
        sreq = urllib.request.Request(
            f"{base}/v1/completions",
            json.dumps({"prompt": "2+2=", "max_tokens": 6, "stream": True}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(sreq, timeout=240) as resp:
            assert resp.headers["Content-Type"].startswith("text/event-stream")
            raw = resp.read().decode()
        lines = [ln for ln in raw.splitlines() if ln.startswith("data: ")]
        assert lines[-1] == "data: [DONE]"
        events = [json.loads(ln[6:]) for ln in lines[:-1]]
        streamed = "".join(c.get("text", "") for e in events for c in e.get("choices", []))
        nonstream = post({"prompt": "2+2=", "max_tokens": 6})
        assert streamed == nonstream["choices"][0]["text"]
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=10)
