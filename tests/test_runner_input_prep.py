# SPDX-License-Identifier: Apache-2.0
"""Runner input-prep unit tests at the model boundary (reference analogue:
test/unit/test_model_runner.py input-prep assertions with mocked NxDI —
here the device programs are bypassed and the numpy arrays are checked
directly)."""
import numpy as np
import pytest

from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                    EngineConfig, ModelConfig,
                                    SchedulerConfig)
from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.worker.model_runner import ModelRunner


@pytest.fixture()
def runner():
    from transformers import LlamaConfig
    hf = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=1, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=256)
    hf.architectures = ["LlamaForCausalLM"]
    config = EngineConfig(
        model=ModelConfig(model="__x__", tokenizer="__x__", dtype="float32",
                          max_model_len=64, hf_config=hf,
                          load_format="random"),
        cache=CacheConfig(block_size=8, enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=4, decode_window=4),
        bucketing=BucketingConfig(),
    )
    r = ModelRunner(config)
    return r


def _add(runner, req_id, prompt, block_ids, nct=0, **sp_kw):
    state = runner.input_batch.add_request(
        req_id=req_id, prompt_token_ids=prompt,
        sampling_params=SamplingParams(**sp_kw), num_computed_tokens=nct,
        block_ids=block_ids)
    runner.input_batch.num_computed[state.row] = nct
    return state


def test_decode_arrays_slots_and_pages(runner):
    # Request at 10 computed tokens with blocks [3, 7] (block_size 8).
    s1 = _add(runner, "a", list(range(9)), [3, 7], nct=10)
    runner.input_batch.last_tokens[s1.row] = 42
    s2 = _add(runner, "b", list(range(5)), [5], nct=5)
    runner.input_batch.last_tokens[s2.row] = 7

    (N, token_ids, positions, slot_table, kv_lens, page_indices,
     temperature, top_k, top_p, _, _) = runner._decode_arrays([s1, s2], K=4)

    assert token_ids[0] == 42 and token_ids[1] == 7
    assert positions[0] == 10 and positions[1] == 5
    assert kv_lens[0] == 11 and kv_lens[1] == 6
    # Row a: positions 10..13 -> block 7 (idx 1) offsets 2..5.
    np.testing.assert_array_equal(slot_table[:, 0],
                                  [7 * 8 + 2, 7 * 8 + 3, 7 * 8 + 4,
                                   7 * 8 + 5])
    # Row b: positions 5..8; block capacity is 1 block = 8 slots, so
    # position 8 is clamped to -1 (no block allocated yet).
    np.testing.assert_array_equal(slot_table[:, 1],
                                  [5 * 8 + 5, 5 * 8 + 6, 5 * 8 + 7, -1])
    assert page_indices[0, 0] == 3 and page_indices[0, 1] == 7
    assert page_indices[1, 0] == 5


def test_decode_arrays_offset_window(runner):
    s1 = _add(runner, "a", list(range(9)), [3, 7], nct=10)
    (_, _, positions, slot_table, kv_lens, *_rest) = \
        runner._decode_arrays([s1], K=2, nct_offset=4)
    assert positions[0] == 14 and kv_lens[0] == 15
    np.testing.assert_array_equal(slot_table[:, 0], [7 * 8 + 6, 7 * 8 + 7])


def test_decode_arrays_sampling_mirrors(runner):
    s1 = _add(runner, "a", [1, 2, 3], [3], nct=3, temperature=0.7,
              top_k=11, top_p=0.5)
    (_, _, _, _, _, _, temperature, top_k, top_p, _, _) = \
        runner._decode_arrays([s1], K=1)
    assert temperature[0] == np.float32(0.7)
    assert top_k[0] == 11
    assert top_p[0] == np.float32(0.5)


def test_forced_preemption_counts(tiny_llama_dir):
    """A pool sized below concurrent demand must preempt (and still finish
    correctly — the correctness side is covered by
    test_preemption_resume_correctness)."""
    from vllm_neuron_tpu import LLM

    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, block_size=8, num_blocks=9,
              skip_tokenizer_init=True)
    prompts = [[i + 3, i + 9] for i in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    llm.generate([{"prompt_token_ids": p} for p in prompts], [sp] * 4)
    assert llm.engine.scheduler._num_preemptions > 0, \
        "expected KV pressure to trigger preemption"
