# SPDX-License-Identifier: Apache-2.0
"""Expert parallelism on the virtual CPU mesh: a dedicated "expert" mesh
axis shards MoE expert weights 1/ep and the shard_map dispatch must stay
token-identical to single-device execution (reference analogue: NxDI
blockwise MoE block_parallel, test/e2e/offline/test_offline_e2e.py:58-69)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams

PROMPTS = [[5, 77, 301, 44, 12], [401, 3, 3, 17]]
SP = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)


@pytest.fixture(scope="module")
def tiny_qwen3_moe_dir(tmp_path_factory):
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(5)
    cfg = Qwen3MoeConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=8,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        norm_topk_prob=True,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = Qwen3MoeForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_qwen3moe_ep")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def refs(tiny_qwen3_moe_dir):
    return [hf_greedy(tiny_qwen3_moe_dir, p, 10) for p in PROMPTS]


def _run(model_dir, **kw):
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True, **kw)
    outs = llm.generate([{"prompt_token_ids": p} for p in PROMPTS],
                        [SP] * len(PROMPTS))
    return [o.outputs[0].token_ids for o in outs]


def test_ep2_exact(tiny_qwen3_moe_dir, refs):
    got = _run(tiny_qwen3_moe_dir, expert_parallel_size=2)
    for g, r in zip(got, refs):
        assert g[:len(r)] == r


def test_tp2_ep2_exact(tiny_qwen3_moe_dir, refs):
    got = _run(tiny_qwen3_moe_dir, tensor_parallel_size=2,
               expert_parallel_size=2)
    for g, r in zip(got, refs):
        assert g[:len(r)] == r


def test_ep4_exact(tiny_qwen3_moe_dir, refs):
    got = _run(tiny_qwen3_moe_dir, expert_parallel_size=4)
    for g, r in zip(got, refs):
        assert g[:len(r)] == r


def test_ep_requires_moe(tiny_llama_dir):
    with pytest.raises(ValueError, match="MoE"):
        _run(tiny_llama_dir, expert_parallel_size=2)


def test_ep_must_divide_experts(tiny_qwen3_moe_dir):
    with pytest.raises(ValueError, match="divisible"):
        _run(tiny_qwen3_moe_dir, expert_parallel_size=3)


def test_ep_shards_expert_weights(tiny_qwen3_moe_dir):
    """EP must be a real mechanism: expert weights live 1/ep per device."""
    import jax

    from vllm_neuron_tpu.config import (EngineConfig, ModelConfig,
                                        ParallelConfig)
    from vllm_neuron_tpu.models.registry import get_model
    from vllm_neuron_tpu.parallel.mesh import build_mesh
    from vllm_neuron_tpu.parallel.sharding import shard_params

    config = EngineConfig(
        model=ModelConfig(model=tiny_qwen3_moe_dir,
                          tokenizer=tiny_qwen3_moe_dir,
                          dtype="float32", max_model_len=128),
        parallel=ParallelConfig(expert_parallel_size=2,
                                tensor_parallel_size=2))
    mesh = build_mesh(config.parallel, jax.devices("cpu")[:4])
    model = get_model(config)
    params = shard_params(model.load_params(tiny_qwen3_moe_dir), mesh, model)
    wg = params["layers"]["we_gate"]  # [L, E, H, I]
    L, E, H, I = wg.shape
    shard_shape = wg.sharding.shard_shape(wg.shape)
    assert shard_shape[1] == E // 2, shard_shape  # expert axis
    assert shard_shape[3] == I // 2, shard_shape  # model axis


def test_ep2_int8_matches_ep1_int8(tiny_qwen3_moe_dir):
    """Quantized experts under EP: the shard_map path (scale slabs over
    the expert axis, post-dot gather) must equal the single-device
    quantized output exactly."""
    base = _run(tiny_qwen3_moe_dir, quantization="int8")
    got = _run(tiny_qwen3_moe_dir, quantization="int8",
               expert_parallel_size=2)
    for g, r in zip(got, base):
        assert g == r, f"{g} vs {r}"
