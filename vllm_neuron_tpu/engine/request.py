# SPDX-License-Identifier: Apache-2.0
"""Engine-internal request state (TPU-native analogue of vllm.v1.request,
which the reference consumes at vllm_neuron/core/scheduler.py:8)."""
from __future__ import annotations

import enum
import time
from typing import Optional

import numpy as np

from vllm_neuron_tpu.sampling.params import SamplingParams


class RequestStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    PREEMPTED = 2
    FINISHED_STOPPED = 10
    FINISHED_LENGTH_CAPPED = 11
    FINISHED_ABORTED = 12
    FINISHED_IGNORED = 13

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status >= RequestStatus.FINISHED_STOPPED


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
    RequestStatus.FINISHED_IGNORED: "ignored",
}


class Request:

    def __init__(
        self,
        req_id: str,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        arrival_time: Optional[float] = None,
        mm_inputs=None,
        lora_int_id: int = 0,
        parent_req_id: Optional[str] = None,
    ):
        self.req_id = req_id
        # n>1 sibling group: children carry the first sibling's id and the
        # scheduler shares the parent's full prompt blocks instead of
        # re-prefilling (core/kv_cache_manager.get_sibling_blocks).
        self.parent_req_id = parent_req_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.sampling_params = sampling_params
        self.eos_token_id = eos_token_id
        self.arrival_time = arrival_time or time.monotonic()
        # Multimodal inputs: {"pixel_values": np.ndarray [T, C, H, W]}.
        self.mm_inputs = mm_inputs
        # Image-content digest (lazy, see mm_hash): the KV of every
        # position after (or cross-attending to) an image depends on the
        # pixels, so the prefix-cache hash chain must be seeded with the
        # image identity — identical token ids with a different image must
        # never share blocks.
        self._mm_hash: Optional[str] = None
        # LoRA adapter group id (0 = base model; lora_loader.py).
        self.lora_int_id = lora_int_id

        self.status = RequestStatus.WAITING
        self.stop_reason: Optional[int | str] = None
        self.output_token_ids: list[int] = []
        # Tokens whose KV is already computed (scheduler bookkeeping).
        self.num_computed_tokens = 0
        # Tokens that must be context-encoded before generation (re)starts:
        # the prompt, plus any pre-preemption output on resumption. Set at
        # admission.
        self.num_context_tokens = len(self.prompt_token_ids)
        # Draft tokens proposed for the next step (speculative decoding).
        self.spec_token_ids: list[int] = []
        # Cumulative logprobs per sampled token (host sampling path).
        self.logprobs: list[dict[int, float]] = []
        # Set when prefix caching found reusable blocks.
        self.num_cached_tokens = 0
        # Content hashes of full prompt blocks (prefix caching), lazily built.
        self.block_hashes: list[int] = []

        # Metrics.
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None

    @property
    def mm_hash(self) -> Optional[str]:
        """SHA1 over the image payload, computed on first use (the prefix
        cache's hash-chain seed — never needed with caching off) and
        cached. Values hash via their exact buffer bytes: anything
        non-numpy is converted first (repr() of a large tensor elides
        interior values and could collide across different images)."""
        if self._mm_hash is None and self.mm_inputs:
            import hashlib
            h = hashlib.sha1()
            for key in sorted(self.mm_inputs):
                v = self.mm_inputs[key]
                h.update(key.encode())
                h.update(np.ascontiguousarray(np.asarray(v)).tobytes())
            self._mm_hash = h.hexdigest()
        return self._mm_hash

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def append_output_token_ids(self, token_id: int) -> None:
        self.output_token_ids.append(token_id)

    def __repr__(self):
        return (f"Request({self.req_id}, status={self.status.name}, "
                f"prompt={self.num_prompt_tokens}, "
                f"out={self.num_output_tokens})")
