# SPDX-License-Identifier: Apache-2.0
"""n>1 parallel sampling: siblings share the parent's prompt blocks instead
of re-prefilling (engine/request.py parent_req_id +
core/kv_cache_manager.get_sibling_blocks). The reference (vLLM) fans n out
as independent requests and only shares via prefix caching; this must work
with prefix caching OFF and must not change any tokens."""
import numpy as np

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams

PROMPT = list(range(2, 42))  # 40 tokens -> 2 full blocks at block_size=16


def _llm(tiny_llama_dir, **kw):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               enable_prefix_caching=False, **kw)


def test_n3_greedy_tokens_exact_and_prefill_shared(tiny_llama_dir):
    llm = _llm(tiny_llama_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=8, n=3, ignore_eos=True)
    out = llm.generate([{"prompt_token_ids": PROMPT}], [sp])[0]
    assert len(out.outputs) == 3
    ref = hf_greedy(tiny_llama_dir, PROMPT, 8)
    for comp in out.outputs:
        assert comp.token_ids[:len(ref)] == ref
    # Sharing: parent prefills all 40 tokens; each child re-encodes only the
    # tail past the last shareable full block (40 - 32 = 8), NOT the whole
    # prompt. Without sharing this would be 3 * 40 = 120.
    prompt_tokens = llm.get_metrics()["prompt_tokens"]
    assert prompt_tokens == 40 + 2 * 8, prompt_tokens


def test_n2_seeded_matches_independent_requests(tiny_llama_dir):
    """Block sharing must not change logits: a seeded sibling must produce
    exactly what the same seed produces as an independent request."""
    llm = _llm(tiny_llama_dir)
    sp = SamplingParams(temperature=0.8, seed=7, max_tokens=8, n=2,
                        ignore_eos=True)
    out = llm.generate([{"prompt_token_ids": PROMPT}], [sp])[0]
    assert len(out.outputs) == 2

    solo = []
    for seed in (7, 8):  # fanout derives child seeds as seed + index
        llm2 = _llm(tiny_llama_dir)
        sp2 = SamplingParams(temperature=0.8, seed=seed, max_tokens=8,
                             ignore_eos=True)
        o = llm2.generate([{"prompt_token_ids": PROMPT}], [sp2])[0]
        solo.append(o.outputs[0].token_ids)
    got = sorted(c.token_ids for c in out.outputs)
    assert got == sorted(solo), (got, solo)


def test_n3_sibling_blocks_freed_cleanly(tiny_llama_dir):
    """All KV blocks return to the pool after a sibling group finishes
    (ref-counted shared blocks must not leak or double-free)."""
    llm = _llm(tiny_llama_dir)
    sched = llm.engine.scheduler
    free_before = sched.kv_manager.num_free_blocks
    sp = SamplingParams(temperature=0.9, seed=3, max_tokens=6, n=3,
                        ignore_eos=True)
    llm.generate([{"prompt_token_ids": PROMPT}], [sp])
    assert sched.kv_manager.num_free_blocks == free_before
    assert not sched.requests  # finished requests are dropped
