# SPDX-License-Identifier: Apache-2.0
"""User-facing per-request sampling parameters.

Semantics mirror the reference's vLLM ``SamplingParams`` surface as exercised by
its tests (reference: test/tiny/test_dynamic_sampling.py, test_cpu_sampling.py):
greedy is temperature==0; temperature==0 must be equivalent to top_k==1;
``n>1`` produces diverse completions; penalties/seeds/logprobs live on the host
sampling path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

# On-device sampling clamps top_k to this ceiling (reference:
# vllm_neuron/worker/neuronx_distributed_model_runner.py:74
# _MAX_NEURON_SAMPLING_TOP_K = 256). Requests exceeding it fall back to the
# host sampler.
MAX_ON_DEVICE_TOP_K = 256


@dataclass
class SamplingParams:
    """Parameters controlling token sampling for one request."""

    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1  # -1 => disabled (all tokens)
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: Union[None, str, Sequence[str]] = None
    stop_token_ids: Optional[Sequence[int]] = None
    ignore_eos: bool = False
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    # OpenAI-style {token_id: additive bias in [-100, 100]} (host path).
    logit_bias: Optional[dict] = None
    detokenize: bool = True
    skip_special_tokens: bool = True

    # Populated internally.
    _all_stop_token_ids: frozenset = field(default_factory=frozenset,
                                           repr=False)

    def __post_init__(self):
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got "
                             f"{self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError(
                f"top_k must be -1 (disabled) or >= 1, got {self.top_k}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if self.repetition_penalty <= 0.0:
            raise ValueError("repetition_penalty must be > 0")
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1 or None")
        if self.min_tokens < 0:
            raise ValueError("min_tokens must be >= 0")
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        elif self.stop is None:
            self.stop = []
        else:
            self.stop = list(self.stop)
        self.stop_token_ids = list(self.stop_token_ids or [])
        self._all_stop_token_ids = frozenset(self.stop_token_ids)

    @property
    def sampling_type(self) -> str:
        return "greedy" if self.temperature == 0.0 else "random"

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0

    def needs_host_sampling(self) -> bool:
        """True when the request uses features the fused on-device sampler
        does not implement (penalties, seeds, logprobs, n>1, min_p)."""
        return (self.presence_penalty != 0.0 or self.frequency_penalty != 0.0
                or self.repetition_penalty != 1.0 or self.seed is not None
                or self.logprobs is not None or self.prompt_logprobs is not None
                or self.min_p > 0.0 or self.n > 1
                or self.logit_bias is not None
                or self.top_k > MAX_ON_DEVICE_TOP_K)
