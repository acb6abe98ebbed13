# SPDX-License-Identifier: Apache-2.0
"""KV pool stress: preemption storms under load and LRU eviction/reuse
correctness for the prefix cache (VERDICT r1 test-mass gaps; reference
analogue: vLLM's block-pool stress suites the plugin inherits)."""
import numpy as np

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


def test_preemption_storm_under_load(tiny_llama_dir):
    """3x more requests than seats on a pool too small to hold them all:
    continuous batching + repeated preemption/resume must stay greedy-exact
    for every request and leak no blocks."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, block_size=16, num_blocks=10,
              skip_tokenizer_init=True)
    sched = llm.engine.scheduler
    free0 = sched.kv_manager.num_free_blocks
    prompts = [[i + 3, i + 9, (i * 7) % 50 + 2, i + 1, i + 11]
               for i in range(12)]
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * len(prompts))
    assert sched._num_preemptions > 0, "pool was not tight enough"
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama_dir, p, 30)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"
    assert sched.kv_manager.num_free_blocks == free0


def test_lru_eviction_then_reuse_exact(tiny_llama_dir):
    """Fill the prefix cache, force LRU eviction with unrelated traffic,
    then re-issue the original prefix: a stale or mis-evicted cache entry
    would corrupt the continuation."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, num_blocks=12,
              enable_prefix_caching=True, skip_tokenizer_init=True)
    sched = llm.engine.scheduler
    free0 = sched.kv_manager.num_free_blocks
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prefix = list(range(2, 36))  # 34 tokens -> 2 full cacheable blocks

    def run(prompt):
        out = llm.generate([{"prompt_token_ids": prompt}], [sp])[0]
        return out.outputs[0].token_ids

    base = run(prefix)

    # Eviction churn: distinct prompts large enough to cycle the pool.
    rng = np.random.default_rng(0)
    for i in range(6):
        churn = rng.integers(40, 500, size=34).tolist()
        run(churn)

    # Re-issue the original prefix (hit or recompute, must be exact) and a
    # prefix-extension (exercises partial-chain reuse after eviction).
    again = run(prefix)
    assert again == base
    ref = hf_greedy(tiny_llama_dir, prefix, 8)
    assert again[:len(ref)] == ref
    ext = prefix + [7, 8]
    ref_ext = hf_greedy(tiny_llama_dir, ext, 8)
    got_ext = run(ext)
    assert got_ext[:len(ref_ext)] == ref_ext
    assert sched.kv_manager.num_free_blocks == free0


def test_eviction_reuse_interleaved_batches(tiny_llama_dir):
    """Batches alternating shared and fresh prefixes while the pool cycles:
    every output exact, pool drained clean at the end."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, block_size=16, num_blocks=14,
              enable_prefix_caching=True, skip_tokenizer_init=True)
    sched = llm.engine.scheduler
    free0 = sched.kv_manager.num_free_blocks
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    shared = list(range(3, 21))  # 18 tokens -> 1 full block
    rng = np.random.default_rng(1)
    for round_i in range(3):
        prompts = [shared + [30 + round_i, 40 + i] for i in range(2)]
        prompts += [rng.integers(50, 500, size=20).tolist()
                    for _ in range(2)]
        outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                            [sp] * len(prompts))
        for p, out in zip(prompts, outs):
            ref = hf_greedy(tiny_llama_dir, p, 6)
            got = out.outputs[0].token_ids[:len(ref)]
            assert got == ref, f"round {round_i} prompt {p}"
    assert sched.kv_manager.num_free_blocks == free0
