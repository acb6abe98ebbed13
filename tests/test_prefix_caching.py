# SPDX-License-Identifier: Apache-2.0
"""Prefix-caching correctness (reference tiny test analogue:
test/tiny/test_prefix_caching_inference.py golden checks; the reference even
ships a bs=1 prefix-cache accuracy bug, README.md:118 — these tests pin the
cases that bug class lives in)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def llm_pc(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, enable_prefix_caching=True,
               skip_tokenizer_init=True)


def test_cache_hit_with_partial_tail_block(llm_pc, tiny_llama_dir):
    """Prompt length not a multiple of block_size: the second run reuses the
    full-block prefix and must still allocate + compute the tail block
    (regression: allocate_slots ignored the cached-prefix length for fresh
    requests, under-allocating the block table)."""
    prompt = list(range(40, 90))  # 50 tokens; block_size 16 -> 3 full + tail
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    ref = hf_greedy(tiny_llama_dir, prompt, 6)
    first = llm_pc.generate({"prompt_token_ids": prompt}, sp)[0]
    assert first.outputs[0].token_ids == ref
    second = llm_pc.generate({"prompt_token_ids": prompt}, sp)[0]
    assert second.outputs[0].token_ids == ref


def test_cache_hit_exact_block_multiple(llm_pc, tiny_llama_dir):
    """Prompt exactly a block multiple: reuse must cap at the last-1 token so
    the final prompt token is recomputed for logits."""
    prompt = list(range(10, 74))  # 64 tokens = 4 full blocks
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    ref = hf_greedy(tiny_llama_dir, prompt, 5)
    for _ in range(2):
        out = llm_pc.generate({"prompt_token_ids": prompt}, sp)[0]
        assert out.outputs[0].token_ids == ref


def test_shared_prefix_divergent_suffix(llm_pc, tiny_llama_dir):
    """Two prompts sharing a long prefix: the second must reuse blocks yet
    produce its own (HF-matching) continuation."""
    base = list(range(100, 148))  # 48 tokens = 3 full blocks
    p1 = base + [7, 8]
    p2 = base + [9, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    o1 = llm_pc.generate({"prompt_token_ids": p1}, sp)[0]
    o2 = llm_pc.generate({"prompt_token_ids": p2}, sp)[0]
    assert o1.outputs[0].token_ids == hf_greedy(tiny_llama_dir, p1, 5)
    assert o2.outputs[0].token_ids == hf_greedy(tiny_llama_dir, p2, 5)


def test_cache_hit_counter(llm_pc):
    pool = llm_pc.engine.scheduler.kv_manager.block_pool
    assert pool.hits > 0, "prefix cache never hit across this module's runs"
