# SPDX-License-Identifier: Apache-2.0
"""OpenAI API server end-to-end tests (reference analogue:
test/e2e/online/* — spawn a real server, poll /health, POST completions,
check results; online_server_runner.py:150-399)."""
import json
import socket
import threading
import time
import urllib.request

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url: str, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _post_stream(url: str, body: dict) -> list[dict]:
    body = dict(body, stream=True)
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                chunks.append(json.loads(payload))
    return chunks


@pytest.fixture(scope="module")
def server(tiny_llama_dir):
    import asyncio

    from vllm_neuron_tpu.engine.async_llm import AsyncEngine
    from vllm_neuron_tpu.engine.llm import build_engine_config
    from vllm_neuron_tpu.server.api_server import OpenAIServer

    config = build_engine_config(tiny_llama_dir, dtype="float32",
                                 max_model_len=128, max_num_seqs=4,
                                 block_size=16)
    port = _free_port()
    ready = threading.Event()
    holder = {}

    def run():
        async def main():
            engine = AsyncEngine(config, tokenizer=None)
            engine.start(asyncio.get_running_loop())
            srv = OpenAIServer(engine, served_model_name="tiny-llama")
            http = await srv.app.serve("127.0.0.1", port)
            holder["engine"] = engine
            ready.set()
            async with http:
                await http.serve_forever()

        try:
            asyncio.run(main())
        except Exception:
            ready.set()
            raise

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(timeout=120)
    # health poll (reference: server.py:169-189)
    for _ in range(60):
        try:
            if _get(f"http://127.0.0.1:{port}/health")["status"] == "ok":
                break
        except Exception:
            time.sleep(0.5)
    yield f"http://127.0.0.1:{port}"
    holder["engine"].shutdown()


def test_health_and_models(server):
    assert _get(f"{server}/health")["status"] == "ok"
    models = _get(f"{server}/v1/models")
    assert models["data"][0]["id"] == "tiny-llama"


def test_completion_token_ids(server, tiny_llama_dir):
    from tests.conftest import hf_greedy
    prompt = [5, 77, 301, 44, 12]
    out = _post(f"{server}/v1/completions", {
        "model": "tiny-llama",
        "prompt": prompt,
        "max_tokens": 8,
        "temperature": 0.0,
        "ignore_eos": True,
    })
    assert out["object"] == "text_completion"
    assert out["usage"]["prompt_tokens"] == 5
    assert out["usage"]["completion_tokens"] == 8
    assert out["choices"][0]["finish_reason"] == "length"


def test_completion_batch_and_n(server):
    out = _post(f"{server}/v1/completions", {
        "model": "tiny-llama",
        "prompt": [[1, 2, 3], [4, 5, 6]],
        "max_tokens": 4,
        "temperature": 0.7,
        "seed": 3,
        "n": 2,
        "ignore_eos": True,
    })
    assert len(out["choices"]) == 4
    assert out["usage"]["completion_tokens"] == 16


def test_streaming_completion(server):
    chunks = _post_stream(f"{server}/v1/completions", {
        "model": "tiny-llama",
        "prompt": [10, 11, 12],
        "max_tokens": 6,
        "temperature": 0.0,
        "ignore_eos": True,
    })
    assert chunks, "no SSE chunks received"
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


def test_bad_request(server):
    import urllib.error
    try:
        _post(f"{server}/v1/completions", {"model": "tiny-llama"})
        assert False, "should have raised"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        err = json.loads(e.read())
        assert "prompt" in err["error"]["message"]


def test_not_found(server):
    import urllib.error
    try:
        _get(f"{server}/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_prompt_too_long_is_400(server):
    import urllib.error
    try:
        _post(f"{server}/v1/completions", {
            "model": "tiny-llama",
            "prompt": list(range(3, 300)),  # > max_model_len=128
            "max_tokens": 4,
        })
        assert False, "should have raised"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        err = json.loads(e.read())
        assert "max_model_len" in err["error"]["message"]
