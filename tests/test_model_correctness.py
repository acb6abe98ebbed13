# SPDX-License-Identifier: Apache-2.0
"""M0 gate: the JAX model must match HF transformers (torch CPU) on logits
and greedy continuations — the offline analogue of the reference's HF-greedy
prefix oracle (online_server_runner.py:95-146)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy, hf_logits
from vllm_neuron_tpu import LLM, SamplingParams

PROMPTS = [
    [5, 77, 301, 44, 12, 99, 8],
    [401, 3, 3, 17],
    [250, 251, 252, 253, 254, 255, 256, 100, 101],
]


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)


def test_prefill_logits_match_hf(llm, tiny_llama_dir):
    prompt = PROMPTS[0]
    ref = hf_logits(tiny_llama_dir, prompt)  # [T, V]

    runner = llm.engine.worker.model_runner
    model = runner.model
    executor = runner.executor
    import jax.numpy as jnp
    from vllm_neuron_tpu.ops.ragged_attention import RaggedMeta

    T = len(prompt)
    spec = executor.kv_spec
    ids = jnp.asarray(prompt, dtype=jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)
    # One sequence writing into pages 1..: slot = page*bs + off.
    bs = spec.block_size
    slots = jnp.asarray([(1 + t // bs) * bs + t % bs for t in range(T)],
                        jnp.int32)
    page_idx = jnp.zeros((1, spec.max_blocks_per_seq), jnp.int32)
    page_idx = page_idx.at[0, :4].set(jnp.arange(1, 5))
    meta = RaggedMeta(
        slot_mapping=slots,
        kv_lens=jnp.asarray([T], jnp.int32),
        page_indices=page_idx,
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
    )
    kv = jnp.zeros(spec.shape, spec.dtype)
    hidden, _ = model.forward(executor.params, ids, positions, kv, meta,
                              kind="prefill")
    logits = model.compute_logits(executor.params, hidden)
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_greedy_matches_hf(llm, tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in PROMPTS],
                        [sp] * len(PROMPTS))
    for prompt, out in zip(PROMPTS, outs):
        ref = hf_greedy(tiny_llama_dir, prompt, 12)
        assert out.outputs[0].token_ids == ref, \
            f"prompt {prompt}: got {out.outputs[0].token_ids}, want {ref}"


def test_greedy_matches_hf_qwen2(tiny_qwen2_dir):
    llm = LLM(model=tiny_qwen2_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompt = PROMPTS[0]
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    ref = hf_greedy(tiny_qwen2_dir, prompt, 10)
    assert out.outputs[0].token_ids == ref


def test_continuous_batching_consistency(llm, tiny_llama_dir):
    """Batched continuous decoding must produce the same tokens as one-by-one
    (reference tiny test: test_continuous_batching_inference.py)."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    batched = llm.generate([{"prompt_token_ids": p} for p in PROMPTS],
                           [sp] * len(PROMPTS))
    for prompt, out in zip(PROMPTS, batched):
        solo = llm.generate({"prompt_token_ids": prompt}, sp)[0]
        assert out.outputs[0].token_ids == solo.outputs[0].token_ids
