# SPDX-License-Identifier: Apache-2.0
"""Scheduler <-> worker interface types.

Re-implements the contract the reference's runner consumes from vLLM V1
(`SchedulerOutput` with scheduled_new_reqs / scheduled_cached_reqs /
num_scheduled_tokens / finished_req_ids; consumed at
vllm_neuron/worker/neuronx_distributed_model_runner.py:381-510) and the
`ModelRunnerOutput` it returns (:293-359)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_neuron_tpu.sampling.params import SamplingParams


@dataclass
class NewRequestData:
    """A request scheduled for the first time (or resumed after preemption)."""
    req_id: str
    prompt_token_ids: list[int]
    block_ids: list[int]
    num_computed_tokens: int  # >0 on a prefix-cache hit or resumption
    sampling_params: SamplingParams
    # Multimodal inputs (Llama-4 class), populated later.
    mm_inputs: Any = None
    # LoRA adapter group id (0 = base model).
    lora_int_id: int = 0


@dataclass
class CachedRequestData:
    """Requests already known to the worker (running decodes / continued
    chunked prefills). Parallel lists indexed together."""
    req_ids: list[str] = field(default_factory=list)
    new_block_ids: list[list[int]] = field(default_factory=list)
    num_computed_tokens: list[int] = field(default_factory=list)

    @property
    def num_reqs(self) -> int:
        return len(self.req_ids)


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: list[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: CachedRequestData = field(
        default_factory=CachedRequestData)
    # req_id -> tokens to run this step (prompt chunk len or 1(+spec)).
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    # Requests that finished/aborted since the last step (worker frees state).
    finished_req_ids: set[str] = field(default_factory=set)
    # req_id -> draft tokens to verify this step (speculative decoding).
    scheduled_spec_decode_tokens: dict[str, list[int]] = field(
        default_factory=dict)
    # True when this is a context-encoding (prefill) step.
    is_prefill_step: bool = False

    @property
    def num_scheduled_reqs(self) -> int:
        return (len(self.scheduled_new_reqs) +
                self.scheduled_cached_reqs.num_reqs)


@dataclass
class LogprobsOutput:
    """Per-request sampled-token logprobs (host sampling path)."""
    token_ids: list[list[int]]  # [num_sampled][k] candidate ids
    logprobs: list[list[float]]  # matching logprob values
    sampled_ranks: list[int]


@dataclass
class ModelRunnerOutput:
    req_ids: list[str] = field(default_factory=list)
    req_id_to_index: dict[str, int] = field(default_factory=dict)
    # Per request: tokens sampled this step ([] while a chunked prefill is
    # still incomplete; >1 under speculative decoding).
    sampled_token_ids: list[list[int]] = field(default_factory=list)
    # Per request logprobs (None unless requested).
    logprobs: list[Optional[LogprobsOutput]] = field(default_factory=list)
    # Draft tokens proposed for the NEXT step (speculative decoding).
    spec_token_ids: Optional[list[list[int]]] = None


EMPTY_MODEL_RUNNER_OUTPUT = ModelRunnerOutput()
