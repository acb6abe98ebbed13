# SPDX-License-Identifier: Apache-2.0
"""Long-context (>4k-token prompt) end-to-end, the reference's large-prompt
demonstration (/root/reference/test/e2e/offline/test_offline_e2e.py:163-200:
a >4k prompt under the 131072 token budget). Greedy continuation must match
HF exactly at 4k+ context, both via whole-prompt prefill (bucketed CE) and
chunked prefill."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams

GEN = 8


@pytest.fixture(scope="module")
def long_prompt():
    rng = np.random.default_rng(42)
    return rng.integers(1, 512, size=4100).tolist()


def test_4k_prompt_whole_prefill(tiny_llama_dir, long_prompt):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=4224,
              max_num_seqs=2, block_size=64, skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=GEN, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": long_prompt}, sp)[0]
    ref = hf_greedy(tiny_llama_dir, long_prompt, GEN)
    assert out.outputs[0].token_ids == ref


def test_4k_prompt_chunked_prefill(tiny_llama_dir, long_prompt):
    """Chunked prefill at 4k context: the prompt streams through the token
    budget in chunks; decode starts only after the full context is encoded."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=4224,
              max_num_seqs=2, block_size=64, enable_chunked_prefill=True,
              skip_tokenizer_init=True,
              override_tpu_config={"chunk_size": 1024})
    sp = SamplingParams(temperature=0.0, max_tokens=GEN, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": long_prompt}, sp)[0]
    ref = hf_greedy(tiny_llama_dir, long_prompt, GEN)
    assert out.outputs[0].token_ids == ref
