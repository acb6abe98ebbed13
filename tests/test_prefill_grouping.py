# SPDX-License-Identifier: Apache-2.0
"""Grouped prefill: same-bucket prompts fuse into ONE ragged program
(model_runner._form_prefill_groups / ops _prefill_batch_attention_dense).
Outputs must be token-identical to HF greedy; host-sampling members must
still dispatch singly with correct logprobs."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    # Grouping is default-off (slower on the bench chip; config.py note) —
    # enabled here to pin its correctness for platforms that want it.
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, block_size=16, skip_tokenizer_init=True,
               override_tpu_config={"prefill_group_size": 8})


def test_grouped_prefill_matches_hf(llm, tiny_llama_dir):
    rng = np.random.default_rng(0)
    # 4 same-bucket (len 9-14) + 2 same-bucket (len 33-40) + 1 odd size:
    # forms a 4-group, a 2-group, and a single in one admission batch.
    lens = [9, 11, 13, 14, 33, 40, 70]
    prompts = [rng.integers(1, 512, size=n).tolist() for n in lens]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * len(prompts))
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama_dir, p, 12)
        assert out.outputs[0].token_ids == ref

    # The grouped program actually ran: a prefill key with S > 1 exists.
    ex = llm.engine.worker.model_runner.executor
    grouped = [k for k in ex._fns
               if k[0] == "step" and k[1] == "prefill" and k[3][0] > 1]
    assert grouped, f"no grouped prefill program compiled: {list(ex._fns)}"


def test_host_sampling_member_splits_out(llm, tiny_llama_dir):
    """A logprobs request in an otherwise groupable batch dispatches singly
    (host path) while the rest group; all outputs stay exact."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 512, size=10 + i).tolist() for i in range(4)]
    sps = [SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
           for _ in range(3)]
    sps.append(SamplingParams(temperature=0.0, max_tokens=8,
                              ignore_eos=True, logprobs=2))
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sps)
    for p, out in zip(prompts, outs):
        assert out.outputs[0].token_ids == hf_greedy(tiny_llama_dir, p, 8)
    assert outs[3].outputs[0].logprobs is not None


def test_grouping_with_prefix_cache(tiny_llama_dir):
    """Groups compose with prefix-cache hits (members with nct > 0)."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, block_size=16, enable_prefix_caching=True,
              skip_tokenizer_init=True,
              override_tpu_config={"prefill_group_size": 8})
    rng = np.random.default_rng(2)
    base = rng.integers(1, 512, size=48).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    llm.generate([{"prompt_token_ids": base}], sp)
    # Two continuations share the cached prefix and group together.
    conts = [base + [7, 8, 9 + i] for i in range(2)]
    outs = llm.generate([{"prompt_token_ids": p} for p in conts], [sp] * 2)
    for p, out in zip(conts, outs):
        assert out.outputs[0].token_ids == hf_greedy(tiny_llama_dir, p, 8)


def test_non_pow2_group_size_stays_warm(tiny_llama_dir):
    """A non-power-of-2 prefill_group_size clamps to power-of-2 group
    sizes at runtime (4+2 here), matching warmup's enumeration — no
    serve-time compiles (round-4 review finding)."""
    from tests.test_warmup_coverage import _spy
    llm6 = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, block_size=16, skip_tokenizer_init=True,
               override_tpu_config={"prefill_group_size": 6})
    llm6.engine.warmup()
    misses = _spy(llm6)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 512, size=20).tolist() for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    outs = llm6.generate([{"prompt_token_ids": p} for p in prompts],
                         [sp] * 6)
    assert all(len(o.outputs[0].token_ids) == 4 for o in outs)
    assert misses == [], f"cold compiles from non-pow2 grouping: {misses}"
