# SPDX-License-Identifier: Apache-2.0
"""Host-side sampler with the full feature set: temperature, top-k, top-p,
min-p, presence/frequency/repetition penalties, per-request seeds, and
logprobs.

TPU-native rebuild of the capability the reference gets from vLLM's CPU
``Sampler`` (SURVEY.md §2.2 V5; routed at
vllm_neuron/worker/neuronx_distributed_model_runner.py:1142-1239). This is the
correctness oracle for the fused on-device sampler (ops/sampling.py):
temperature==0 is exactly equivalent to top_k==1 (greedy argmax).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from vllm_neuron_tpu.core.sched_output import LogprobsOutput
from vllm_neuron_tpu.sampling.params import SamplingParams


@dataclass
class SampleResult:
    token_id: int
    logprobs: Optional[LogprobsOutput] = None
    cumulative_logprob: float = 0.0


class RequestSamplerState:
    """Per-request sampler state: RNG stream and token-frequency counts."""

    __slots__ = ("rng", "output_counts", "prompt_token_set",
                 "cumulative_logprob")

    def __init__(self, sampling_params: SamplingParams,
                 prompt_token_ids: list[int]):
        seed = sampling_params.seed
        self.rng = np.random.default_rng(seed)
        self.output_counts: dict[int, int] = {}
        self.prompt_token_set = (set(prompt_token_ids) if
                                 sampling_params.repetition_penalty != 1.0
                                 else None)
        self.cumulative_logprob = 0.0

    def observe(self, token_id: int) -> None:
        self.output_counts[token_id] = self.output_counts.get(token_id, 0) + 1


def _apply_penalties(logits: np.ndarray, sp: SamplingParams,
                     state: RequestSamplerState) -> np.ndarray:
    if (sp.presence_penalty == 0.0 and sp.frequency_penalty == 0.0
            and sp.repetition_penalty == 1.0):
        return logits
    logits = logits.copy()
    if state.output_counts:
        ids = np.fromiter(state.output_counts.keys(), dtype=np.int64)
        counts = np.fromiter(state.output_counts.values(), dtype=np.float32)
        if sp.frequency_penalty != 0.0:
            logits[ids] -= sp.frequency_penalty * counts
        if sp.presence_penalty != 0.0:
            logits[ids] -= sp.presence_penalty
    if sp.repetition_penalty != 1.0:
        seen = set(state.output_counts.keys())
        if state.prompt_token_set:
            seen |= state.prompt_token_set
        if seen:
            ids = np.fromiter(seen, dtype=np.int64)
            vals = logits[ids]
            logits[ids] = np.where(vals > 0, vals / sp.repetition_penalty,
                                   vals * sp.repetition_penalty)
    return logits


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max()
    s = x - m
    return s - np.log(np.exp(s).sum())


def sample_token(logits: np.ndarray, sp: SamplingParams,
                 state: RequestSamplerState) -> SampleResult:
    """Sample one token from a [V] float32 logits row."""
    logits = _apply_penalties(logits.astype(np.float32), sp, state)
    if sp.logit_bias:
        for tid, bias in sp.logit_bias.items():
            tid = int(tid)
            if 0 <= tid < logits.shape[0]:
                logits[tid] += float(bias)

    want_logprobs = sp.logprobs is not None
    logprobs_row = _log_softmax(logits) if want_logprobs else None

    if sp.is_greedy:
        token = int(np.argmax(logits))
    else:
        scaled = logits / max(sp.temperature, 1e-6)
        probs = _softmax(scaled)
        probs = _filter_top_k(probs, sp.top_k)
        probs = _filter_top_p(probs, sp.top_p)
        probs = _filter_min_p(probs, sp.min_p)
        total = probs.sum()
        if total <= 0.0 or not np.isfinite(total):
            token = int(np.argmax(logits))
        else:
            probs = probs / total
            token = int(_sample_from_probs(probs, state.rng))

    result = SampleResult(token_id=token)
    if want_logprobs:
        k = sp.logprobs
        token_lp = float(logprobs_row[token])
        state.cumulative_logprob += token_lp
        if k and k > 0:
            top_ids = np.argpartition(-logprobs_row, min(
                k, logprobs_row.size - 1))[:k]
            top_ids = top_ids[np.argsort(-logprobs_row[top_ids])]
            cand_ids = list(dict.fromkeys([token] + top_ids.tolist()))
        else:
            cand_ids = [token]
        rank = int((logprobs_row > logprobs_row[token]).sum()) + 1
        result.logprobs = LogprobsOutput(
            token_ids=[cand_ids],
            logprobs=[[float(logprobs_row[i]) for i in cand_ids]],
            sampled_ranks=[rank],
        )
    result.cumulative_logprob = state.cumulative_logprob
    state.observe(token)
    return result


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max()
    e = np.exp(x - m)
    return e / e.sum()


def _filter_top_k(probs: np.ndarray, top_k: int) -> np.ndarray:
    if top_k < 0 or top_k >= probs.size:
        return probs
    kth = np.partition(probs, -top_k)[-top_k]
    return np.where(probs >= kth, probs, 0.0)


def _filter_top_p(probs: np.ndarray, top_p: float) -> np.ndarray:
    if top_p >= 1.0:
        return probs
    order = np.argsort(-probs)
    sorted_probs = probs[order]
    cumsum = np.cumsum(sorted_probs)
    # Keep the smallest set whose mass reaches top_p (the first token is
    # always kept).
    cutoff_mask = (cumsum - sorted_probs) < top_p
    keep = np.zeros_like(probs, dtype=bool)
    keep[order[cutoff_mask]] = True
    return np.where(keep, probs, 0.0)


def _filter_min_p(probs: np.ndarray, min_p: float) -> np.ndarray:
    if min_p <= 0.0:
        return probs
    threshold = min_p * probs.max()
    return np.where(probs >= threshold, probs, 0.0)


def _sample_from_probs(probs: np.ndarray, rng: np.random.Generator) -> int:
    u = rng.random()
    cdf = np.cumsum(probs)
    return int(np.searchsorted(cdf, u * cdf[-1], side="right").clip(
        0, probs.size - 1))
