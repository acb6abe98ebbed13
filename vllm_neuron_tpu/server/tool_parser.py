# SPDX-License-Identifier: Apache-2.0
"""Tool-call output parsers.

The reference enables tool calling through vLLM's ``--enable-auto-tool-choice
--tool-call-parser llama3_json`` (reference: test/utils/server/
start_server.sh:113-139, test/e2e/online/configs.py:118-135). The llama3_json
convention: the model emits a JSON object (optionally prefixed by the
``<|python_tag|>`` token text) of the form
``{"name": "...", "parameters": {...}}`` — or ``"arguments"`` instead of
``"parameters"``; multiple calls may be ";"-separated.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Optional

from vllm_neuron_tpu.server.protocol import make_id

PYTHON_TAG = "<|python_tag|>"


@dataclass
class ToolCall:
    name: str
    arguments: str  # JSON-encoded string (OpenAI convention)
    id: str


def _try_parse_one(text: str) -> Optional[dict]:
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        return None
    if isinstance(obj, dict) and "name" in obj and \
            ("parameters" in obj or "arguments" in obj):
        return obj
    return None


def parse_llama3_json(text: str) -> tuple[Optional[list[ToolCall]], str]:
    """Returns (tool_calls, content). tool_calls is None when the output is
    ordinary text (content holds it); content is "" when calls were parsed.
    """
    stripped = text.strip()
    if stripped.startswith(PYTHON_TAG):
        stripped = stripped[len(PYTHON_TAG):].strip()
    candidates = []
    obj = _try_parse_one(stripped)
    if obj is not None:
        candidates = [obj]
    elif ";" in stripped:
        parts = [p for p in (s.strip() for s in stripped.split(";")) if p]
        objs = [_try_parse_one(p) for p in parts]
        if objs and all(o is not None for o in objs):
            candidates = objs
    if not candidates:
        return None, text
    calls = []
    for obj in candidates:
        args = obj.get("parameters", obj.get("arguments", {}))
        calls.append(
            ToolCall(name=obj["name"],
                     arguments=json.dumps(args, ensure_ascii=False),
                     id=make_id("chatcmpl-tool")))
    return calls, ""


TOOL_PARSERS = {
    "llama3_json": parse_llama3_json,
}
