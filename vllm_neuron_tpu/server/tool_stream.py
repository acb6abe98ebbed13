# SPDX-License-Identifier: Apache-2.0
"""Incremental llama3_json tool-call parsing for streamed chat responses.

The reference serves streamed tool calls through vLLM's OpenAI frontend
(--enable-auto-tool-choice --tool-call-parser llama3_json; reference:
test/utils/server/start_server.sh:113-139, test/e2e/online/configs.py:
118-135). OpenAI streaming convention: the first delta for a call carries
``{index, id, type, function: {name, arguments: ""}}``; subsequent deltas
carry raw JSON fragments of the arguments in
``{index, function: {arguments: <fragment>}}``.

This parser is fed decoded-text deltas as they stream out of the engine:

- Output that does not open with ``{`` (after optional ``<|python_tag|>``)
  is ordinary content and passes straight through — nothing is withheld.
- Once a candidate call object opens, text is buffered ONLY until the
  ``"name"`` field completes (a few tokens); the name delta is emitted
  immediately and the ``parameters``/``arguments`` value then streams out
  as raw fragments while the model is still generating them.
- ``;``-separated multi-call outputs advance the OpenAI ``index``.
- If the buffer turns out not to be a tool call (no name / malformed),
  everything withheld is replayed as content on flush — worst case the
  client sees the text arrive late, never wrong.

Named/forced ``tool_choice`` (``{"type": "function", "function": {"name":
X}}``): the model was shown only tool X, so output may be either a full
call object or a bare arguments object; ``forced_name`` makes the parser
emit X as the name immediately and treat a top-level object without a
``"name"`` key as the arguments value itself.
"""
from __future__ import annotations

import json
import re
from typing import Optional

from vllm_neuron_tpu.server.protocol import make_id
from vllm_neuron_tpu.server.tool_parser import PYTHON_TAG

_NAME_RE = re.compile(r'"name"\s*:\s*"((?:[^"\\]|\\.)*)"')
_PARAMS_RE = re.compile(r'"(?:parameters|arguments)"\s*:\s*')


def _value_span(buf: str, start: int) -> tuple[int, Optional[int]]:
    """Span of the JSON value starting at buf[start]: returns (start, end)
    with end exclusive, or (start, None) while incomplete. Supports
    object/array (brace-counted, string-aware) and string values; scalars
    resolve only once a top-level ``,`` or ``}`` follows."""
    if start >= len(buf):
        return start, None
    c0 = buf[start]
    if c0 in "{[":
        open_c, close_c = c0, "}" if c0 == "{" else "]"
        depth = 0
        in_str = esc = False
        for i in range(start, len(buf)):
            c = buf[i]
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == open_c:
                depth += 1
            elif c == close_c:
                depth -= 1
                if depth == 0:
                    return start, i + 1
        return start, None
    if c0 == '"':
        in_str, esc = True, False
        for i in range(start + 1, len(buf)):
            c = buf[i]
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                return start, i + 1
        return start, None
    # Scalar (number/bool/null): complete at the next top-level , or }.
    for i in range(start, len(buf)):
        if buf[i] in ",}":
            return start, i
    return start, None


class StreamingToolCallParser:
    """Feed text deltas; get OpenAI chat-chunk ``delta`` payloads back."""

    def __init__(self, forced_name: Optional[str] = None):
        self.forced = forced_name
        self.buf = ""           # all text after committing to tool mode
        self.mode = "detect"    # detect | content | tools
        self.calls: list[dict] = []  # emission state per call index
        self._scan_from = 0     # buf offset where the current call starts
        self.saw_tool_calls = False

    # -- emission helpers ------------------------------------------------

    def _open_call(self, name: str) -> dict:
        state = {"id": make_id("chatcmpl-tool"), "name": name,
                 "args_sent": 0, "done": False}
        self.calls.append(state)
        self.saw_tool_calls = True
        return {"tool_calls": [{
            "index": len(self.calls) - 1,
            "id": state["id"],
            "type": "function",
            "function": {"name": name, "arguments": ""},
        }]}

    def _args_delta(self, fragment: str) -> dict:
        return {"tool_calls": [{
            "index": len(self.calls) - 1,
            "function": {"arguments": fragment},
        }]}

    # -- feeding ---------------------------------------------------------

    def feed(self, delta: str) -> list[dict]:
        if self.mode == "content":
            return [{"content": delta}] if delta else []
        self.buf += delta
        if self.mode == "detect":
            probe = self.buf.lstrip()
            if probe.startswith(PYTHON_TAG):
                probe = probe[len(PYTHON_TAG):].lstrip()
            if probe.startswith("{"):
                self.mode = "tools"
                self._scan_from = len(self.buf) - len(probe)
            elif probe and not PYTHON_TAG.startswith(probe):
                if self.forced is not None:
                    # Forced tool_choice: the response is committed to
                    # calling the named tool — non-JSON output is dropped
                    # (mirrors the non-streaming _force_named_call, which
                    # falls back to "{}" arguments).
                    return []
                # Provably not a tool call — release everything.
                self.mode = "content"
                out, self.buf = self.buf, ""
                return [{"content": out}]
            else:
                return []  # still ambiguous (whitespace / tag prefix)
        return self._pump(final=False)

    def flush(self) -> list[dict]:
        """End of generation: finalize or replay the withheld text."""
        events: list[dict] = []
        if self.mode == "detect" and self.buf:
            if self.forced is None:
                out, self.buf = self.buf, ""
                return [{"content": out}]
            self.buf = ""  # forced: non-call text is dropped
        elif self.mode == "tools":
            events = self._pump(final=True)
            if not self.saw_tool_calls and \
                    self.buf[self._scan_from:].strip():
                # Buffered a candidate that never became a call.
                if self.forced is None:
                    events.append({"content": self.buf[self._scan_from:]})
                self.buf = ""
        if self.forced is not None and not self.saw_tool_calls:
            # Forced tool_choice responses MUST carry the named call.
            events.append(self._open_call(self.forced))
            events.append(self._args_delta("{}"))
        return events

    # -- the incremental scanner ------------------------------------------

    def _pump(self, final: bool) -> list[dict]:
        events: list[dict] = []
        while True:
            seg = self.buf[self._scan_from:]
            stripped = seg.lstrip()
            pad = len(seg) - len(stripped)
            if stripped.startswith(PYTHON_TAG):
                extra = len(PYTHON_TAG)
                stripped = stripped[extra:].lstrip()
                pad = len(seg) - len(stripped)
            if stripped.startswith(";"):
                self._scan_from += pad + 1
                continue
            if not stripped:
                return events
            start = self._scan_from + pad
            if not stripped.startswith("{"):
                # Trailing non-JSON text after calls: content.
                if final or self.calls:
                    self._scan_from = len(self.buf)
                    events.append({"content": seg[pad:]})
                return events
            cur = self.calls[-1] if self.calls and \
                not self.calls[-1]["done"] else None
            obj_start, obj_end = _value_span(self.buf, start)
            body = self.buf[start:obj_end if obj_end else len(self.buf)]

            if cur is None:
                # Need a name before emitting anything for this call.
                m = _NAME_RE.search(body)
                if m is not None:
                    events.append(self._open_call(
                        json.loads(f'"{m.group(1)}"')))
                    cur = self.calls[-1]
                elif self.forced is not None and (
                        obj_end is not None or final or
                        self._forced_bare_args(body)):
                    # Forced mode: top-level object with no name key is
                    # the arguments object itself.
                    events.append(self._open_call(self.forced))
                    cur = self.calls[-1]
                    cur["bare_args"] = True
                else:
                    return events  # keep buffering (name incomplete)

            if cur.get("bare_args"):
                a_start, a_end = start, obj_end
            else:
                m = _PARAMS_RE.search(body)
                if m is None:
                    a_start = a_end = None
                else:
                    a_start, a_end = _value_span(self.buf,
                                                 start + m.end())
            if a_start is not None:
                avail = a_end if a_end is not None else len(self.buf)
                frag = self.buf[a_start + cur["args_sent"]:avail]
                if frag:
                    cur["args_sent"] += len(frag)
                    events.append(self._args_delta(frag))

            if obj_end is None:
                if final and cur["args_sent"] == 0:
                    # Incomplete call with no streamable args: emit an
                    # empty-object arguments delta so the call is valid.
                    events.append(self._args_delta("{}"))
                    cur["args_sent"] = 2
                    cur["done"] = True
                return events
            cur["done"] = True
            if cur["args_sent"] == 0:
                events.append(self._args_delta("{}"))
                cur["args_sent"] = 2
            self._scan_from = obj_end

    def _forced_bare_args(self, body: str) -> bool:
        """In forced mode, commit to bare-args as soon as the first
        top-level key is complete and is NOT "name"."""
        m = re.match(r'\s*\{\s*"((?:[^"\\]|\\.)*)"\s*:', body)
        return m is not None and m.group(1) != "name"
