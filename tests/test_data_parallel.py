# SPDX-License-Identifier: Apache-2.0
"""Data-parallel engine lanes (engine/dp.py): real request-level DP —
requests split across lanes on disjoint devices, outputs exact vs dp=1.

Round 1's "data" mesh axis replicated the batch (parallelism without
throughput); these tests pin the replacement's semantics: work actually
splits, lanes place arrays on their own devices, and results are
bit-identical to a single-engine run."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams
from vllm_neuron_tpu.engine.dp import DPEngine


def _greedy(max_tokens=8):
    return SamplingParams(temperature=0.0, max_tokens=max_tokens,
                          ignore_eos=True)


PROMPTS = [
    {"prompt_token_ids": [5, 77, 301, 44, 12]},
    {"prompt_token_ids": [9, 3, 250]},
    {"prompt_token_ids": [100, 200, 300, 400]},
    {"prompt_token_ids": [7, 7, 7, 7, 7, 7]},
    {"prompt_token_ids": [42]},
    {"prompt_token_ids": [11, 22, 33, 44, 55, 66, 77]},
]


def test_dp2_exact_and_split(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              data_parallel_size=2)
    assert isinstance(llm.engine, DPEngine)
    outs = llm.generate(PROMPTS, _greedy())
    for p, out in zip(PROMPTS, outs):
        ref = hf_greedy(tiny_llama_dir, p["prompt_token_ids"], 8)
        assert list(out.outputs[0].token_ids) == ref

    # Both lanes actually served requests (least-loaded routing).
    started = [c.metrics.requests_started for c in llm.engine.cores]
    assert all(s > 0 for s in started), started
    assert sum(started) == len(PROMPTS)

    # Lanes own DISJOINT devices.
    d0 = set(llm.engine.cores[0].config.parallel.devices)
    d1 = set(llm.engine.cores[1].config.parallel.devices)
    assert d0 and d1 and not (d0 & d1)

    # Aggregate metrics merge lane counters.
    snap = llm.engine.metrics.snapshot()
    assert snap["requests_finished"] == len(PROMPTS)
    assert "vllm_tpu_ttft_seconds_count" in llm.engine.metrics.prometheus()


def test_dp2_tp2_composes(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              data_parallel_size=2, tensor_parallel_size=2)
    outs = llm.generate(PROMPTS[:4], _greedy())
    for p, out in zip(PROMPTS[:4], outs):
        ref = hf_greedy(tiny_llama_dir, p["prompt_token_ids"], 8)
        assert list(out.outputs[0].token_ids) == ref
    started = [c.metrics.requests_started for c in llm.engine.cores]
    assert all(s > 0 for s in started), started


def test_dp_n_siblings_share_lane(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
              data_parallel_size=2, enable_prefix_caching=True)
    sp = SamplingParams(temperature=0.8, max_tokens=6, n=3, seed=7,
                        ignore_eos=True)
    out = llm.generate({"prompt_token_ids": [5, 77, 301, 44, 12]}, sp)[0]
    assert len(out.outputs) == 3
    # All three children ran on ONE lane (shared prefill / prefix cache).
    started = [c.metrics.requests_started for c in llm.engine.cores]
    assert sorted(started) == [0, 3], started


def test_dp_requires_enough_devices(tiny_llama_dir):
    with pytest.raises(ValueError, match="devices"):
        LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
            max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
            data_parallel_size=5, tensor_parallel_size=2)  # 10 > 8


def test_dp_preempt_under_load(tiny_llama_dir):
    """More requests than lanes x max_num_seqs with a tiny KV pool:
    queueing + (possible) preemption across lanes stays exact."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, num_blocks=12,
              skip_tokenizer_init=True, data_parallel_size=2)
    prompts = PROMPTS * 2
    outs = llm.generate(prompts, _greedy(12))
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama_dir, p["prompt_token_ids"], 12)
        assert list(out.outputs[0].token_ids) == ref
