# SPDX-License-Identifier: Apache-2.0
"""Llama-4 text model vs HF transformers (CPU oracle).

Reference capability: NeuronLlama4ForCausalLM
(worker/neuronx_distributed_model_loader.py:559-609). Exercises MoE layers
with shared expert, interleaved-pair rope, nope layers with temperature
tuning, and qk l2-norm."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_llama4_dir(tmp_path_factory):
    import torch
    from transformers import Llama4TextConfig, Llama4ForCausalLM

    torch.manual_seed(9)
    cfg = Llama4TextConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=64,
        intermediate_size_mlp=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=1,
        interleave_moe_layer_step=2,  # layers 1,3 MoE; 0,2 dense
        max_position_embeddings=256,
        attention_chunk_size=32,  # exercise chunked local attention
        attn_temperature_tuning=True,
        use_qk_norm=True,
        tie_word_embeddings=False,
    )
    model = Llama4ForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_llama4")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_llama4_greedy_matches_hf(tiny_llama4_dir):
    llm = LLM(model=tiny_llama4_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    prompts = [[5, 77, 301, 44, 12], list(range(200, 240))]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * len(prompts))
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama4_dir, p, 10)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"


def test_llama4_tp2_exact(tiny_llama4_dir):
    """Per-layer-dict param trees shard under a mesh (param_specs handles
    the list layout): tp2 greedy == HF. Regression for the round-2 fix —
    shard_params previously crashed on list-of-dict layers, making
    Llama-4 unservable multi-chip."""
    llm = LLM(model=tiny_llama4_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              tensor_parallel_size=2)
    prompts = [[5, 77, 301, 44, 12], list(range(200, 240))]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * len(prompts))
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama4_dir, p, 10)
        assert out.outputs[0].token_ids[:len(ref)] == ref


def test_llama4_int8_generate(tiny_llama4_dir):
    """Llama-4 quantization (previously a silent no-op): dense + shared
    expert + routed expert stacks all carry int8 values + scales, and
    the engine still serves."""
    import jax.numpy as jnp

    llm = LLM(model=tiny_llama4_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              quantization="int8")
    layers = llm.engine.worker.model_runner.executor.params["layers"]
    moe_lp = next(lp for lp in layers if "router" in lp)
    dense_lp = next(lp for lp in layers if "wg" in lp)
    assert moe_lp["gate_up"].dtype == jnp.int8 and "gate_up_scale" in moe_lp
    assert moe_lp["shared_wg"].dtype == jnp.int8
    assert dense_lp["wg"].dtype == jnp.int8
    out = llm.generate({"prompt_token_ids": [5, 77, 301, 44, 12]},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 8
