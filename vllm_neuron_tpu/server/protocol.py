# SPDX-License-Identifier: Apache-2.0
"""OpenAI-compatible request parsing (the schema surface the reference's
users hit through vLLM's api_server: /v1/completions and
/v1/chat/completions; reference: test/utils/server/start_server.sh:141,
online_server_runner.py:219-222)."""
from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_neuron_tpu.sampling.params import SamplingParams


def _get(body: dict, key: str, default=None, types: tuple = ()):
    value = body.get(key, default)
    if value is not None and types and not isinstance(value, types):
        raise ValueError(f"`{key}` must be of type "
                         f"{'/'.join(t.__name__ for t in types)}")
    return value


def sampling_from_body(body: dict, max_tokens_default: int = 16
                       ) -> SamplingParams:
    max_tokens = _get(body, "max_tokens", None, (int,))
    if max_tokens is None:
        max_tokens = _get(body, "max_completion_tokens",
                          max_tokens_default, (int,))
    stop = body.get("stop")
    n = _get(body, "n", 1, (int,))
    best_of = _get(body, "best_of", None, (int,))
    if best_of is not None and best_of != n:
        raise ValueError("best_of != n is not supported")
    logprobs = body.get("logprobs")
    top_logprobs = body.get("top_logprobs")
    if isinstance(logprobs, bool):  # chat API style
        logprobs = (top_logprobs or 0) if logprobs else None
    return SamplingParams(
        n=n,
        temperature=_get(body, "temperature", 1.0, (int, float)),
        top_p=_get(body, "top_p", 1.0, (int, float)),
        top_k=_get(body, "top_k", -1, (int,)),
        min_p=_get(body, "min_p", 0.0, (int, float)),
        presence_penalty=_get(body, "presence_penalty", 0.0, (int, float)),
        frequency_penalty=_get(body, "frequency_penalty", 0.0, (int, float)),
        repetition_penalty=_get(body, "repetition_penalty", 1.0,
                                (int, float)),
        seed=_get(body, "seed", None, (int,)),
        max_tokens=max_tokens,
        min_tokens=_get(body, "min_tokens", 0, (int,)),
        stop=stop,
        stop_token_ids=body.get("stop_token_ids"),
        ignore_eos=bool(body.get("ignore_eos", False)),
        logprobs=logprobs,
        logit_bias={int(k): float(v)
                    for k, v in body["logit_bias"].items()}
        if isinstance(body.get("logit_bias"), dict) else None,
    )


def make_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex}"


def now() -> int:
    return int(time.time())


@dataclass
class UsageInfo:
    prompt_tokens: int = 0
    completion_tokens: int = 0

    def to_dict(self) -> dict:
        return {
            "prompt_tokens": self.prompt_tokens,
            "completion_tokens": self.completion_tokens,
            "total_tokens": self.prompt_tokens + self.completion_tokens,
        }
