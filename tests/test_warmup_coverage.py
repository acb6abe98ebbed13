# SPDX-License-Identifier: Apache-2.0
"""Warmup covers every program variant serving can reach.

The reference warms all NxDI buckets at load unless skip_warmup (SURVEY.md
N13); the VERDICT-r3 gap was that warmup() here missed the host-sampling
(logprobs/seeds/penalties), speculation, and intermediate-page-bucket
variants — each a potential minutes-long cold compile in the serving path.
These tests warm an engine, then run serve-shaped workloads designed to hit
every program family and assert NO new program is compiled."""
import numpy as np
import pytest

from vllm_neuron_tpu import LLM, SamplingParams


def _spy(llm):
    """Record any program key created after this point."""
    ex = llm.engine.worker.model_runner.executor
    misses: list[tuple] = []
    orig = ex._get_fn

    def spying_get_fn(key, builder):
        if key not in ex._fns:
            misses.append(key)
        return orig(key, builder)

    ex._get_fn = spying_get_fn
    return misses


def _gen(llm, prompts, sps):
    return llm.generate([{"prompt_token_ids": p} for p in prompts], sps)


def _mixed_workload(vocab: int, max_len: int):
    """Prompts/params hitting: tiny + mid + near-max prompts (all token and
    page buckets), greedy device sampling, windowed decode, and every
    host-sampling trigger (logprobs, seed, penalties, min_p, n>1)."""
    rng = np.random.default_rng(0)
    gen = 16
    prompts = [
        [7, 3],                                                 # tiny
        rng.integers(1, vocab, size=17).tolist(),               # mid
        rng.integers(1, vocab, size=max_len - gen - 1).tolist(),  # near-max
        rng.integers(1, vocab, size=33).tolist(),
    ]
    sps = [
        SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True),
        SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True,
                       logprobs=3),                              # host row
        SamplingParams(temperature=0.8, seed=7, max_tokens=gen,
                       ignore_eos=True),                         # host row
        SamplingParams(temperature=0.7, top_k=5, top_p=0.9,
                       max_tokens=gen, ignore_eos=True),         # device row
    ]
    return prompts, sps


def _assert_no_compiles(llm, vocab, max_len):
    misses = _spy(llm)
    prompts, sps = _mixed_workload(vocab, max_len)
    _gen(llm, prompts, sps)
    # Second wave: all-host batch + penalties + n>1 (parallel sampling).
    _gen(llm, prompts[:2], [
        SamplingParams(temperature=0.9, presence_penalty=0.5, max_tokens=8,
                       ignore_eos=True),
        SamplingParams(temperature=0.8, seed=1, n=2, max_tokens=8,
                       ignore_eos=True),
    ])
    assert misses == [], f"serve-time cold compiles after warmup: {misses}"


@pytest.fixture(scope="module")
def warm_llm(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, enable_prefix_caching=True,
              skip_tokenizer_init=True)
    llm.engine.warmup()
    return llm


def test_warmup_covers_serving(warm_llm):
    _assert_no_compiles(warm_llm, 512, 128)


def test_warmup_covers_prefix_cache_hits(warm_llm):
    """Cache-hit re-prefills dispatch with num_new << end — intermediate
    (N, PP) pairs the old warmup missed."""
    misses = _spy(warm_llm)
    rng = np.random.default_rng(1)
    base = rng.integers(1, 512, size=100).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    _gen(warm_llm, [base], [sp])
    _gen(warm_llm, [base + [5, 6, 7]], [sp])  # hit: tiny num_new, large end
    assert misses == [], f"cold compiles on prefix-cache hit: {misses}"


def test_warmup_covers_speculation(tiny_llama_dir, tiny_eagle_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
              speculative_config={"model": tiny_eagle_dir,
                                  "num_speculative_tokens": 3,
                                  "method": "eagle"})
    llm.engine.warmup()
    _assert_no_compiles(llm, 512, 128)


def test_warmup_covers_chunked_prefill(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, enable_chunked_prefill=True,
              skip_tokenizer_init=True,
              override_tpu_config={"chunk_size": 32})
    llm.engine.warmup()
    _assert_no_compiles(llm, 512, 128)


def test_warmup_covers_sibling_adoption(tiny_llama_dir):
    """n>1 children adopt the parent's full prompt blocks even with prefix
    caching OFF (kv_cache_manager.get_sibling_blocks), dispatching with
    num_new in [1, block_size] but end = the whole prompt — the smallest
    token bucket must therefore cover every page bucket (round-4 review
    finding: the narrowed warmup range missed these keys)."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, enable_prefix_caching=False,
              skip_tokenizer_init=True)
    llm.engine.warmup()
    misses = _spy(llm)
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, 512, size=100).tolist()
    _gen(llm, [prompt], [SamplingParams(temperature=0.8, seed=3, n=2,
                                        max_tokens=8, ignore_eos=True)])
    assert misses == [], f"cold compiles on sibling adoption: {misses}"
