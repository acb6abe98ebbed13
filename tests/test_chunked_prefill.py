# SPDX-License-Identifier: Apache-2.0
"""Chunked prefill (reference: test/tiny/test_chunked_prefill_inference.py —
long prompts under a small token budget must still produce exact greedy
output; scheduler path at vllm_neuron/core/scheduler.py via
DISABLE_NEURON_CUSTOM_SCHEDULER, runner path model_runner.py:938-1051)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


def test_chunked_prefill_exact(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, enable_chunked_prefill=True,
              skip_tokenizer_init=True,
              override_tpu_config={"chunk_size": 24})
    # Prompts longer than the 24-token chunk budget: prefill spans steps.
    prompts = [list(range(40, 100)), list(range(200, 250)),
               [5, 77, 301, 44]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * len(prompts))
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama_dir, p, 8)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt len {len(p)}: {got} vs {ref}"


def test_chunked_prefill_mixes_decode(tiny_llama_dir):
    """While one long prompt prefills in chunks, running decodes keep
    making progress (token-budget scheduling)."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, enable_chunked_prefill=True,
              skip_tokenizer_init=True,
              override_tpu_config={"chunk_size": 16})
    engine = llm.engine
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)
    engine.add_request("short", [3, 4, 5], sp)
    # Let the short request reach decode.
    engine.step()
    engine.add_request("long", list(range(30, 94)), sp)
    progressed_during_prefill = False
    for _ in range(6):
        outs = engine.step()
        ids = {o.request_id for o in outs}
        long_req = engine.scheduler.requests.get("long")
        if long_req is not None and \
                long_req.num_computed_tokens < long_req.num_prompt_tokens \
                and "short" in ids:
            progressed_during_prefill = True
    assert progressed_during_prefill, \
        "decode made no progress while the long prompt was chunking"
    while engine.has_unfinished_requests():
        engine.step()


def test_sequence_parallel_validation(tiny_llama_dir):
    """SP requires context buckets divisible by the TP size (reference:
    test/tiny/test_sequence_parallel.py divisibility error)."""
    with pytest.raises(ValueError, match="divisible"):
        LLM(model=tiny_llama_dir, dtype="float32", max_model_len=100,
            max_num_seqs=2, block_size=16, tensor_parallel_size=8,
            sequence_parallel=True, skip_tokenizer_init=True,
            override_tpu_config={"context_encoding_buckets": [100]})
