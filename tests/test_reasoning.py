# SPDX-License-Identifier: Apache-2.0
"""Reasoning-parser unit tests (--reasoning-parser capability; SURVEY.md
§2.2 V2 — the reference inherits this from vLLM's OpenAI frontend)."""
import pytest

from vllm_neuron_tpu.server.reasoning import (REASONING_PARSERS,
                                              ThinkTagParser)

P = ThinkTagParser("think")


def test_registry():
    assert "deepseek_r1" in REASONING_PARSERS
    assert "qwen3" in REASONING_PARSERS


@pytest.mark.parametrize("text,reasoning,content", [
    ("<think>step 1</think>answer", "step 1", "answer"),
    ("<think>a\nb</think>\nanswer", "a\nb", "answer"),
    # R1 templates open the block in the prompt: no open tag in output.
    ("thoughts</think>final", "thoughts", "final"),
    ("plain answer", None, "plain answer"),
    # Unclosed block (max_tokens cut): all reasoning.
    ("<think>never stops", "never stops", ""),
])
def test_parse(text, reasoning, content):
    r, c = P.parse(text)
    assert r == reasoning
    assert c == content


def _drive(deltas):
    s = P.stream()
    r_all, c_all = "", ""
    for d in deltas:
        r, c = s.feed(d)
        r_all += r
        c_all += c
    r_t, c_t = s.flush()
    r_all += r_t
    c_all += c_t
    return r_all, c_all


def test_stream_basic():
    assert _drive(["<think>ab", "c</think>xy", "z"]) == ("abc", "xyz")


def test_stream_close_tag_split_across_deltas():
    # "</think>" arrives one char at a time — holdback must not leak it.
    deltas = ["<think>r"] + list("</think>") + ["ans"]
    assert _drive(deltas) == ("r", "ans")


def test_stream_angle_bracket_in_reasoning():
    # A "<" in reasoning that never becomes the close tag must be emitted.
    assert _drive(["<think>a<b", "c</think>ok"]) == ("a<bc", "ok")


def test_stream_no_open_tag():
    assert _drive(["alpha", "</think>", "beta"]) == ("alpha", "beta")


def test_stream_unclosed_flush():
    assert _drive(["<think>forever", " more"]) == ("forever more", "")


def test_stream_everything_in_one_delta():
    assert _drive(["<think>r</think>c"]) == ("r", "c")


def test_stream_content_only_routes_to_content():
    """A stream with NO think block must land in content, matching the
    batch parse() (regression: it used to stream as reasoning_content)."""
    from vllm_neuron_tpu.server.reasoning import ThinkTagParser

    q = ThinkTagParser("think", implicit_open=False)

    def drive(deltas):
        s = q.stream()
        r_all, c_all = "", ""
        for d in deltas:
            r, c = s.feed(d)
            r_all += r
            c_all += c
        r_t, c_t = s.flush()
        return r_all + r_t, c_all + c_t

    assert drive(["plain ", "answer"]) == ("", "plain answer")
    # Explicit open still splits.
    assert drive(["<think>r</think>", "ans"]) == ("r", "ans")
    # A stream that ends while still a prefix of "<think>" is content.
    assert drive(["<thi"]) == ("", "<thi")
    # R1-style implicit open (the default): reasoning until close.
    from vllm_neuron_tpu.server.reasoning import REASONING_PARSERS
    r1 = REASONING_PARSERS["deepseek_r1"].stream()
    out = [r1.feed("thinking..."), r1.feed("</think>done")]
    assert out[0] == ("thinking...", "") and out[1][1] == "done"
