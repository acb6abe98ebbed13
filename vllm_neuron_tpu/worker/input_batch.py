# SPDX-License-Identifier: Apache-2.0
"""Persistent decode batch with stable per-request row slots.

TPU-native analogue of the reference's persistent ``InputBatch`` +
``free_seq_ids`` slot allocator (vllm_neuron/worker/
neuronx_distributed_model_runner.py:111-137, :704-717): each running request
owns a stable row index for its whole lifetime, so its KV block table and
decode inputs never migrate between rows — and because the allocator always
hands out the smallest free row, active rows stay packed at the front, letting
the runner pick the smallest token-generation bucket that covers them.
"""
from __future__ import annotations

import heapq
from typing import Optional

import numpy as np

from vllm_neuron_tpu.sampling.params import SamplingParams


class CachedRequestState:
    __slots__ = ("req_id", "row", "prompt_token_ids", "output_token_ids",
                 "sampling_params", "num_computed_tokens", "block_ids",
                 "mm_inputs", "in_prefill", "lora_int_id",
                 "cross_ready")

    def __init__(self, req_id: str, row: int, prompt_token_ids: list[int],
                 sampling_params: SamplingParams, num_computed_tokens: int,
                 block_ids: list[int], mm_inputs=None, lora_int_id: int = 0):
        self.req_id = req_id
        self.row = row
        self.prompt_token_ids = prompt_token_ids
        self.output_token_ids: list[int] = []
        self.sampling_params = sampling_params
        self.num_computed_tokens = num_computed_tokens
        self.block_ids = block_ids
        self.mm_inputs = mm_inputs
        self.in_prefill = True
        self.lora_int_id = lora_int_id
        # Cross-KV row cache populated/cleared for this request (Mllama).
        self.cross_ready = False

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def token_at(self, idx: int) -> int:
        np_ = self.num_prompt_tokens
        return (self.prompt_token_ids[idx]
                if idx < np_ else self.output_token_ids[idx - np_])

    def tokens_range(self, start: int, end: int) -> list[int]:
        """token_at over [start, end) as two list slices (prefill input
        prep is on the TTFT-critical path; a per-token loop is not)."""
        np_ = self.num_prompt_tokens
        out = self.prompt_token_ids[start:min(end, np_)]
        if end > np_:
            out = out + self.output_token_ids[max(start - np_, 0):end - np_]
        return out


class InputBatch:
    """Fixed-capacity row-slotted batch state, mirrored in numpy for O(1)
    device-input assembly."""

    def __init__(self, max_num_seqs: int, max_blocks_per_seq: int,
                 block_size: int):
        self.max_num_seqs = max_num_seqs
        self.max_blocks_per_seq = max_blocks_per_seq
        self.block_size = block_size

        self.requests: dict[str, CachedRequestState] = {}
        self.row_to_req: list[Optional[str]] = [None] * max_num_seqs
        self._free_rows = list(range(max_num_seqs))
        heapq.heapify(self._free_rows)

        # Dense per-row mirrors (padded block table uses the null block 0).
        self.block_tables = np.zeros((max_num_seqs, max_blocks_per_seq),
                                     dtype=np.int32)
        self.context_lens = np.zeros(max_num_seqs, dtype=np.int32)
        self.last_tokens = np.zeros(max_num_seqs, dtype=np.int32)
        self.num_computed = np.zeros(max_num_seqs, dtype=np.int32)
        self.num_blocks = np.zeros(max_num_seqs, dtype=np.int32)
        self.needs_host = np.zeros(max_num_seqs, dtype=bool)
        # Dense sampling-param mirrors for the on-device sampler
        # (reference analogue: prepare_sampling_params [B,3] tensor,
        # model_runner.py:1106-1140).
        self.temperature = np.ones(max_num_seqs, dtype=np.float32)
        self.top_k = np.full(max_num_seqs, -1, dtype=np.int32)
        self.top_p = np.ones(max_num_seqs, dtype=np.float32)
        self.seeds = np.zeros(max_num_seqs, dtype=np.uint32)
        # LoRA adapter group id per row (0 = base; lora_loader.py).
        self.adapter_ids = np.zeros(max_num_seqs, dtype=np.int32)

    @property
    def num_active(self) -> int:
        return len(self.requests)

    def max_active_row(self) -> int:
        """Highest occupied row index + 1 (0 when empty)."""
        hi = 0
        for state in self.requests.values():
            hi = max(hi, state.row + 1)
        return hi

    def add_request(self, req_id: str, prompt_token_ids: list[int],
                    sampling_params: SamplingParams,
                    num_computed_tokens: int, block_ids: list[int],
                    mm_inputs=None, lora_int_id: int = 0
                    ) -> CachedRequestState:
        if req_id in self.requests:
            raise ValueError(f"duplicate request {req_id}")
        if not self._free_rows:
            raise RuntimeError("InputBatch is full")
        row = heapq.heappop(self._free_rows)
        state = CachedRequestState(req_id, row, prompt_token_ids,
                                   sampling_params, num_computed_tokens,
                                   block_ids, mm_inputs, lora_int_id)
        self.requests[req_id] = state
        self.row_to_req[row] = req_id
        nb = min(len(block_ids), self.max_blocks_per_seq)
        self.block_tables[row, :nb] = block_ids[:nb]
        self.block_tables[row, nb:] = 0
        self.context_lens[row] = num_computed_tokens
        self.num_computed[row] = num_computed_tokens
        self.num_blocks[row] = nb
        self.adapter_ids[row] = lora_int_id
        sp = sampling_params
        self.temperature[row] = sp.temperature
        self.top_k[row] = sp.top_k
        self.top_p[row] = sp.top_p
        self.seeds[row] = np.uint32((sp.seed or 0) & 0xFFFFFFFF)
        return state

    def append_block_ids(self, req_id: str, new_block_ids: list[int]) -> None:
        if not new_block_ids:
            return
        state = self.requests[req_id]
        start = len(state.block_ids)
        state.block_ids.extend(new_block_ids)
        end = min(len(state.block_ids), self.max_blocks_per_seq)
        self.block_tables[state.row, start:end] = \
            new_block_ids[:end - start]
        self.num_blocks[state.row] = end

    def remove_request(self, req_id: str) -> None:
        state = self.requests.pop(req_id, None)
        if state is None:
            return
        row = state.row
        self.row_to_req[row] = None
        heapq.heappush(self._free_rows, row)
        self.block_tables[row] = 0
        self.context_lens[row] = 0
        self.last_tokens[row] = 0
        self.num_computed[row] = 0
        self.num_blocks[row] = 0
        self.needs_host[row] = False
        self.adapter_ids[row] = 0
        self.temperature[row] = 1.0
        self.top_k[row] = -1
        self.top_p[row] = 1.0
        self.seeds[row] = 0
