# SPDX-License-Identifier: Apache-2.0
"""Reasoning-output parsers (the ``--reasoning-parser`` capability the
reference inherits from vLLM's OpenAI frontend; SURVEY.md §2.2 V2).

Models like DeepSeek-R1 / Qwen3 emit chain-of-thought wrapped in
``<think>...</think>`` before the answer. The OpenAI-compat convention:
the wrapped text goes to ``message.reasoning_content`` and the remainder
to ``message.content``. R1-style chat templates often open the block in
the generation prompt itself, so text with no ``<think>`` but a stray
``</think>`` is treated as reasoning-then-answer too.
"""
from __future__ import annotations

from typing import Optional


class ThinkTagParser:
    """Parses ``<tag>...</tag>`` reasoning blocks, batch and streaming.

    ``implicit_open``: R1-style chat templates open the block inside the
    generation prompt, so the streamed output IS reasoning until the close
    tag even though no open tag appears. Qwen3-style models emit the open
    tag themselves — a stream that doesn't start with it is plain content
    (non-thinking mode)."""

    def __init__(self, tag: str = "think", implicit_open: bool = True):
        self.open = f"<{tag}>"
        self.close = f"</{tag}>"
        self.implicit_open = implicit_open

    def parse(self, text: str) -> tuple[Optional[str], str]:
        """Returns (reasoning_content, content) for a complete output."""
        close_at = text.find(self.close)
        if close_at < 0:
            if text.lstrip().startswith(self.open):
                # Unclosed block: everything is reasoning (hit max_tokens).
                body = text.lstrip()[len(self.open):]
                return body, ""
            return None, text
        head = text[:close_at]
        open_at = head.find(self.open)
        reasoning = head[open_at + len(self.open):] if open_at >= 0 else head
        content = text[close_at + len(self.close):]
        if content.startswith("\n"):
            content = content[1:]
        return reasoning, content

    def stream(self) -> "ThinkTagStream":
        return ThinkTagStream(self)


class ThinkTagStream:
    """Incremental splitter: feed text deltas, get
    (reasoning_delta, content_delta) pairs suitable for SSE chunks."""

    def __init__(self, parser: ThinkTagParser):
        self.p = parser
        self.buf = ""
        self.done_reasoning = False
        # None = undecided (stream start), True = inside a reasoning
        # block, False = plain content stream (no block).
        self._in_reasoning: Optional[bool] = parser.implicit_open or None
        self._emitted = 0  # reasoning chars already handed out

    def feed(self, delta: str) -> tuple[str, str]:
        if self.done_reasoning:
            return "", delta
        self.buf += delta
        if self._in_reasoning is None:
            # Explicit-open models (Qwen3): decide from the stream head.
            head = self.buf.lstrip()
            if not head.startswith(self.p.open):
                if self.p.open.startswith(head):
                    return "", ""  # still a prefix of the open tag: hold
                # No block: the whole stream is content (matches parse()).
                self.done_reasoning = True
                out, self.buf = self.buf, ""
                return "", out
            self._in_reasoning = True
        close_at = self.buf.find(self.p.close)
        if close_at >= 0:
            head = self.buf[:close_at]
            open_at = head.find(self.p.open)
            if open_at >= 0:
                head = head[open_at + len(self.p.open):]
            reasoning_delta = head[self._emitted:]
            content = self.buf[close_at + len(self.p.close):]
            if content.startswith("\n"):
                content = content[1:]
            self.done_reasoning = True
            return reasoning_delta, content
        # Still inside (or possibly before) the block. Hold back a suffix
        # that could be a partial close tag; emit the rest as reasoning.
        hold = 0
        for k in range(len(self.p.close) - 1, 0, -1):
            if self.buf.endswith(self.p.close[:k]):
                hold = k
                break
        visible = self.buf[:len(self.buf) - hold]
        open_at = visible.find(self.p.open)
        if open_at >= 0:
            visible = (visible[:open_at] +
                       visible[open_at + len(self.p.open):])
        out = visible[self._emitted:]
        self._emitted += len(out)
        return out, ""

    def flush(self) -> tuple[str, str]:
        """End of stream: release held-back text. Returns (reasoning_delta,
        content_delta) — an undecided explicit-open stream (buf was a
        prefix of the open tag) resolves to content; an open reasoning
        block (max_tokens cut) resolves to reasoning."""
        if self.done_reasoning:
            return "", ""
        self.done_reasoning = True
        if self._in_reasoning is None:
            return "", self.buf
        visible = self.buf
        open_at = visible.find(self.p.open)
        if open_at >= 0:
            visible = (visible[:open_at] +
                       visible[open_at + len(self.p.open):])
        return visible[self._emitted:], ""


REASONING_PARSERS = {
    "deepseek_r1": ThinkTagParser("think", implicit_open=True),
    "qwen3": ThinkTagParser("think", implicit_open=False),
}
