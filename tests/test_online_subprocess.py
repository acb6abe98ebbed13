# SPDX-License-Identifier: Apache-2.0
"""True online e2e: spawn the OpenAI server as a SUBPROCESS, poll /health,
serve completions over real HTTP, tear down, and assert clean exit —
the full process lifecycle the reference drives in
test/utils/server/server.py:70-456 (spawn + wait_for_server_ready + kill).

The in-thread server tests (test_api_server.py) cover API semantics; this
file covers the process boundary: CLI arg parsing, engine bring-up inside
a fresh interpreter, signal-driven shutdown."""
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class ServerProc:
    """Subprocess server lifecycle: spawn -> health-poll -> use -> stop."""

    def __init__(self, model_dir: str, *extra_args: str,
                 startup_timeout: float = 180.0):
        self.port = _free_port()
        self.base = f"http://127.0.0.1:{self.port}"
        env = dict(os.environ)
        # The subprocess must not grab the TPU while benches run there.
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "vllm_neuron_tpu.server.api_server",
             "--model", model_dir, "--served-model-name", "m",
             "--device", "cpu", "--dtype", "float32",
             "--max-model-len", "128", "--max-num-seqs", "4",
             "--block-size", "16", "--host", "127.0.0.1",
             # CI speed: skip the full-variant warmup (covered by
             # test_warmup_coverage.py); mirrors the reference's tests all
             # passing skip_warmup.
             "--skip-warmup",
             "--port", str(self.port), *extra_args],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        self.startup_timeout = startup_timeout

    def wait_ready(self) -> None:
        deadline = time.monotonic() + self.startup_timeout
        while time.monotonic() < deadline:
            if self.proc.poll() is not None:
                out = self.proc.stdout.read().decode(errors="replace")
                raise RuntimeError(
                    f"server died during startup (rc={self.proc.returncode})"
                    f":\n{out[-4000:]}")
            try:
                with urllib.request.urlopen(f"{self.base}/health",
                                            timeout=5) as r:
                    if r.status == 200:
                        return
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(0.5)
        self.stop()
        raise TimeoutError("server did not become healthy in time")

    def post(self, path: str, body: dict, timeout: float = 120.0) -> dict:
        req = urllib.request.Request(
            self.base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    def get(self, path: str) -> dict:
        with urllib.request.urlopen(self.base + path, timeout=30) as r:
            return json.loads(r.read())

    def stop(self, timeout: float = 20.0) -> int:
        if self.proc.poll() is None:
            self.proc.send_signal(signal.SIGTERM)
            try:
                self.proc.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait(timeout=timeout)
        if self.proc.stdout:
            self.proc.stdout.close()
        return self.proc.returncode


@pytest.fixture(scope="module")
def server(tiny_llama_dir):
    srv = ServerProc(tiny_llama_dir)
    srv.wait_ready()
    yield srv
    srv.stop()


def test_health_and_models(server):
    assert server.get("/health") == {"status": "ok"}
    models = server.get("/v1/models")
    assert models["data"][0]["id"]


def test_completion_roundtrip(server):
    out = server.post("/v1/completions", {
        "model": "m", "prompt": [5, 77, 301, 44, 12],
        "max_tokens": 8, "temperature": 0.0, "ignore_eos": True,
    })
    assert out["usage"]["prompt_tokens"] == 5
    assert out["usage"]["completion_tokens"] == 8
    assert out["choices"][0]["finish_reason"] == "length"


def test_greedy_matches_hf_over_http(server, tiny_llama_dir):
    """HF-golden check over the real HTTP boundary (reference:
    online_server_runner.py:95-146 _run_hf_fulltext_prefix_check)."""
    from tests.conftest import hf_greedy

    prompt = [5, 77, 301, 44, 12]
    ref = hf_greedy(tiny_llama_dir, prompt, 8)
    # Token-level check: ask for token ids via logprobs-free completion and
    # compare through a second HF-side decode-free path — the server keeps
    # token ids out of the completions schema, so use echo-free usage +
    # determinism across two calls plus the in-process oracle run below.
    out1 = server.post("/v1/completions", {
        "model": "m", "prompt": prompt, "max_tokens": 8,
        "temperature": 0.0, "ignore_eos": True, "logprobs": 1,
    })
    out2 = server.post("/v1/completions", {
        "model": "m", "prompt": prompt, "max_tokens": 8,
        "temperature": 0.0, "ignore_eos": True, "logprobs": 1,
    })
    toks1 = out1["choices"][0]["logprobs"]["tokens"]
    toks2 = out2["choices"][0]["logprobs"]["tokens"]
    assert toks1 == toks2, "greedy is not deterministic over HTTP"
    # Without a tokenizer the server reports raw token ids as strings.
    got = [int(t) for t in toks1]
    assert got[:len(ref)] == ref, (got, ref)


def test_concurrent_load(server):
    """More in-flight requests than max_num_seqs: queueing + continuous
    batching across the HTTP boundary."""
    import concurrent.futures as cf

    def one(i):
        return server.post("/v1/completions", {
            "model": "m", "prompt": [7 + i, 3, 9, 2],
            "max_tokens": 6, "temperature": 0.0, "ignore_eos": True,
        })

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        outs = list(pool.map(one, range(8)))
    for out in outs:
        assert out["usage"]["completion_tokens"] == 6


def test_clean_shutdown(tiny_llama_dir):
    srv = ServerProc(tiny_llama_dir)
    srv.wait_ready()
    rc = srv.stop()
    # SIGTERM exit: either a handled clean exit (0) or the default
    # signal-death code (-SIGTERM); anything else is a crash.
    assert rc in (0, -signal.SIGTERM), rc
