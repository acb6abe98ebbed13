# SPDX-License-Identifier: Apache-2.0
"""Streamed tool calls + named tool_choice (VERDICT r2 missing #2).

The reference serves both through vLLM's OpenAI frontend
(--enable-auto-tool-choice --tool-call-parser llama3_json; reference:
test/e2e/online/configs.py:118-135, test/utils/server/start_server.sh:
113-139). Contract checked here:

- streaming a llama3_json call emits OpenAI ``tool_calls`` deltas (first
  delta: index/id/type/name; later deltas: raw argument fragments) while
  the model is still generating, and ``finish_reason == "tool_calls"``;
- plain text passes through as content deltas — never silently withheld;
- ``tool_choice={"type": "function", "function": {"name": X}}`` commits
  the response to a call to X even when the model emits bare arguments.
"""
import asyncio
import json

import pytest

from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.server.tool_stream import StreamingToolCallParser


def drive(text, step, forced_name=None):
    p = StreamingToolCallParser(forced_name=forced_name)
    events = []
    for i in range(0, len(text), step):
        events.extend(p.feed(text[i:i + step]))
    events.extend(p.flush())
    return p, events


def reassemble(events):
    """OpenAI client-side reassembly: (calls, content)."""
    calls, content = {}, []
    for ev in events:
        if "content" in ev:
            content.append(ev["content"])
        for tc in ev.get("tool_calls", ()):
            idx = tc["index"]
            if "id" in tc:
                calls[idx] = {"id": tc["id"], "name": tc["function"]["name"],
                              "arguments": tc["function"].get("arguments",
                                                              "")}
            else:
                calls[idx]["arguments"] += tc["function"]["arguments"]
    return [calls[i] for i in sorted(calls)], "".join(content)


CALL = '{"name": "get_weather", "parameters": {"city": "Paris, \\"FR\\"", ' \
       '"unit": "c", "days": 3}}'


@pytest.mark.parametrize("step", [1, 2, 3, 5, 7, 64])
def test_single_call_all_fragmentations(step):
    p, events = drive(CALL, step)
    calls, content = reassemble(events)
    assert p.saw_tool_calls
    assert content == ""
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == \
        json.loads(CALL)["parameters"]


@pytest.mark.parametrize("step", [1, 3, 9])
def test_python_tag_prefix(step):
    p, events = drive("<|python_tag|>" + CALL, step)
    calls, content = reassemble(events)
    assert content == "" and len(calls) == 1
    assert calls[0]["name"] == "get_weather"


def test_args_stream_before_call_completes():
    """Argument fragments must flow while the JSON is still open."""
    p = StreamingToolCallParser()
    head = '{"name": "f", "parameters": {"text": "abc'
    events = p.feed(head)
    # Name is complete -> the open-call delta and the partial args
    # must already be out, though the object has not closed.
    calls, _ = reassemble(events)
    assert len(calls) == 1 and calls[0]["name"] == "f"
    assert calls[0]["arguments"].startswith('{"text": "abc')
    events += p.feed('def"}}')
    events += p.flush()
    calls, _ = reassemble(events)
    assert json.loads(calls[0]["arguments"]) == {"text": "abcdef"}


@pytest.mark.parametrize("step", [1, 4, 11])
def test_multi_call_semicolon(step):
    text = '{"name": "a", "parameters": {"x": 1}}; ' \
           '{"name": "b", "arguments": {"y": [2, 3]}}'
    p, events = drive(text, step)
    calls, content = reassemble(events)
    assert content == ""
    assert [c["name"] for c in calls] == ["a", "b"]
    assert json.loads(calls[0]["arguments"]) == {"x": 1}
    assert json.loads(calls[1]["arguments"]) == {"y": [2, 3]}
    assert calls[0]["id"] != calls[1]["id"]


@pytest.mark.parametrize("step", [1, 3, 80])
def test_plain_content_passthrough(step):
    text = "The weather in Paris is sunny today."
    p, events = drive(text, step)
    calls, content = reassemble(events)
    assert not p.saw_tool_calls and not calls
    assert content == text


def test_content_not_withheld_once_provably_text():
    """A non-JSON, non-tag opener must be released on the FIRST feed."""
    p = StreamingToolCallParser()
    events = p.feed("Hello")
    assert events == [{"content": "Hello"}]
    assert p.feed(" world") == [{"content": " world"}]


@pytest.mark.parametrize("step", [1, 5])
def test_false_positive_json_replayed_as_content(step):
    text = '{"foo": 1, "bar": "baz"} trailing'
    p, events = drive(text, step)
    calls, content = reassemble(events)
    assert not p.saw_tool_calls and not calls
    assert content == text


@pytest.mark.parametrize("step", [1, 4, 50])
def test_forced_bare_args(step):
    """Named tool_choice: model may emit ONLY the arguments object."""
    text = '{"city": "Paris", "unit": "c"}'
    p, events = drive(text, step, forced_name="get_weather")
    calls, content = reassemble(events)
    assert content == ""
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == json.loads(text)


@pytest.mark.parametrize("step", [1, 6])
def test_forced_full_object(step):
    p, events = drive(CALL, step, forced_name="get_weather")
    calls, _ = reassemble(events)
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == \
        json.loads(CALL)["parameters"]


@pytest.mark.parametrize("step", [1, 8])
def test_forced_nonjson_output_still_calls(step):
    """Forced tool_choice commits the response to the named call even
    when the model emits prose (mirrors _force_named_call's "{}"
    fallback; the prose is dropped, not misfiled as content)."""
    p, events = drive("I think the weather is nice.", step,
                      forced_name="get_weather")
    calls, content = reassemble(events)
    assert content == ""
    assert len(calls) == 1 and calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {}


def test_forced_empty_output_still_calls():
    p = StreamingToolCallParser(forced_name="f")
    events = p.flush()
    calls, content = reassemble(events)
    assert content == "" and calls[0]["name"] == "f"
    assert json.loads(calls[0]["arguments"]) == {}


def test_call_without_args_gets_empty_object():
    p, events = drive('{"name": "ping", "parameters": {}}', 3)
    calls, _ = reassemble(events)
    assert json.loads(calls[0]["arguments"]) == {}


def test_trailing_content_after_call():
    text = CALL + " done."
    p, events = drive(text, 7)
    calls, content = reassemble(events)
    assert len(calls) == 1
    assert content.strip() == "done."


# ---------------------------------------------------------------------------
# _force_named_call (non-streaming named tool_choice)
# ---------------------------------------------------------------------------

def test_force_named_call_bare_args():
    from vllm_neuron_tpu.server.api_server import _force_named_call
    calls, content = _force_named_call('{"city": "Paris"}', None, "f")
    assert content == ""
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}


def test_force_named_call_renames_stray():
    from vllm_neuron_tpu.server.api_server import _force_named_call
    from vllm_neuron_tpu.server.tool_parser import parse_llama3_json
    parsed, _ = parse_llama3_json('{"name": "other", "parameters": '
                                  '{"x": 1}}')
    calls, content = _force_named_call("raw", parsed, "f")
    assert calls[0].name == "f"
    assert json.loads(calls[0].arguments) == {"x": 1}


def test_force_named_call_garbage_raw():
    from vllm_neuron_tpu.server.api_server import _force_named_call
    calls, content = _force_named_call("not json at all", None, "f")
    assert calls[0].name == "f" and calls[0].arguments == "{}"


# ---------------------------------------------------------------------------
# SSE contract through _stream_chat (fake engine; no device needed)
# ---------------------------------------------------------------------------

class _Comp:
    def __init__(self, text, finish=None):
        self.text = text
        self.finish_reason = finish
        self.logprobs = None
        self.token_ids = []


class _Out:
    def __init__(self, text, finished):
        self.outputs = [_Comp(text, "stop" if finished else None)]
        self.finished = finished


class _FakeEngine:
    """Streams a fixed text in fixed-size increments."""
    tokenizer = None

    def __init__(self, text, step=5):
        self.text, self.step = text, step

    def check_health(self):
        return True

    async def generate(self, token_ids, sp, lora_request=None):
        for i in range(self.step, len(self.text), self.step):
            yield _Out(self.text[:i], False)
        yield _Out(self.text, True)


def _collect_sse(server, tools_active, forced_name=None):
    async def run():
        chunks = []
        async for line in server._stream_chat(
                "chatcmpl-x", [1, 2], SamplingParams(max_tokens=8),
                tools_active=tools_active, forced_name=forced_name):
            chunks.append(json.loads(line))
        return chunks
    return asyncio.run(run())


def _mk_server(text, step=5):
    from vllm_neuron_tpu.server.api_server import OpenAIServer
    return OpenAIServer(_FakeEngine(text, step), "m",
                        enable_auto_tools=True, tool_parser="llama3_json")


def test_sse_tool_call_chunks():
    server = _mk_server(CALL, step=4)
    chunks = _collect_sse(server, tools_active=True)
    deltas = [c["choices"][0]["delta"] for c in chunks]
    calls, content = reassemble([d for d in deltas if d])
    assert content == ""
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == \
        json.loads(CALL)["parameters"]
    # Multiple argument deltas -> the call streamed incrementally.
    arg_deltas = [d for d in deltas if d.get("tool_calls") and
                  "id" not in d["tool_calls"][0]]
    assert len(arg_deltas) >= 2
    assert chunks[-1]["choices"][0]["finish_reason"] == "tool_calls"


def test_sse_plain_content_unchanged():
    server = _mk_server("Just words, no tools here.", step=6)
    chunks = _collect_sse(server, tools_active=True)
    deltas = [c["choices"][0]["delta"] for c in chunks]
    _, content = reassemble([d for d in deltas if d])
    assert content == "Just words, no tools here."
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
