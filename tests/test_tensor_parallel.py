# SPDX-License-Identifier: Apache-2.0
"""Tensor/sequence parallelism on the virtual CPU mesh: sharded execution
must be token-identical to single-device (the reference hides TP inside the
compiled NEFF and can't test this without hardware — SURVEY.md §4.4 calls
out the virtual-mesh option as our advantage)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams

PROMPTS = [[5, 77, 301, 44, 12], [401, 3, 3, 17]]
SP = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)


@pytest.fixture(scope="module")
def refs(tiny_llama_dir):
    return [hf_greedy(tiny_llama_dir, p, 10) for p in PROMPTS]


def _run(tiny_llama_dir, **kw):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True, **kw)
    outs = llm.generate([{"prompt_token_ids": p} for p in PROMPTS],
                        [SP] * len(PROMPTS))
    return [o.outputs[0].token_ids for o in outs]


def test_tp2_exact(tiny_llama_dir, refs):
    got = _run(tiny_llama_dir, tensor_parallel_size=2)
    for g, r in zip(got, refs):
        assert g[:len(r)] == r


def test_tp2_with_sequence_parallel(tiny_llama_dir, refs):
    got = _run(tiny_llama_dir, tensor_parallel_size=2,
               sequence_parallel=True)
    for g, r in zip(got, refs):
        assert g[:len(r)] == r


def test_tp4_dp2_mesh(tiny_llama_dir, refs):
    got = _run(tiny_llama_dir, tensor_parallel_size=4,
               data_parallel_size=2)
    for g, r in zip(got, refs):
        assert g[:len(r)] == r


def test_tp2_int8_sharded(tiny_llama_dir):
    """Quantized weights + scales shard over the mesh and still generate."""
    got = _run(tiny_llama_dir, tensor_parallel_size=2, quantization="int8")
    base = _run(tiny_llama_dir, quantization="int8")
    assert got == base, f"tp2 int8 {got} vs single-dev int8 {base}"
