# SPDX-License-Identifier: Apache-2.0
"""Qwen3-MoE vs HF transformers (CPU oracle) — greedy + MoE routing math.

Reference capability: qwen3_moe via NxDI blockwise MoE
(worker/neuronx_distributed_model_loader.py:647-648)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


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
    path = tmp_path_factory.mktemp("tiny_qwen3moe")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_qwen3_moe_greedy_matches_hf(tiny_qwen3_moe_dir):
    llm = LLM(model=tiny_qwen3_moe_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    prompts = [[5, 77, 301, 44, 12], [401, 3, 3, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * 2)
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_qwen3_moe_dir, p, 10)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"


def test_moe_ragged_equals_dense():
    """The sorted ragged_dot dispatch must match the one-hot dense path."""
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.moe import _moe_dense, _moe_ragged, route

    rng = np.random.default_rng(0)
    N, H, E, I, k = 12, 32, 6, 24, 2
    x = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(H, E)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(E, H, I)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(E, H, I)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(E, I, H)) * 0.1, jnp.float32)
    weights, ids = route(x, router, k, True)
    dense = np.asarray(_moe_dense(x, weights, ids, wg, wu, wd))
    ragged = np.asarray(_moe_ragged(x, weights, ids, wg, wu, wd))
    np.testing.assert_allclose(ragged, dense, atol=1e-5, rtol=1e-5)


def test_moe_quantized_scales_ragged_equals_dense():
    """Quantized expert paths: ragged (post-dot scale gather) == dense
    (whole-stack dequant), and both track the unquantized output."""
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.moe import _moe_dense, _moe_ragged, route
    from vllm_neuron_tpu.ops.quant import quantize_per_channel

    rng = np.random.default_rng(11)
    N, H, I, E, k = 16, 32, 24, 8, 2
    x = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(H, E)) * 0.3, jnp.float32)
    wg = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    wu = rng.normal(size=(E, H, I)).astype(np.float32) * 0.2
    wd = rng.normal(size=(E, I, H)).astype(np.float32) * 0.2
    weights, ids = route(x, router, k, True)
    dense_ref = _moe_dense(x, weights, ids, jnp.asarray(wg),
                           jnp.asarray(wu), jnp.asarray(wd))
    qs = [quantize_per_channel(w, "int8") for w in (wg, wu, wd)]
    qw = [jnp.asarray(q) for q, _ in qs]
    sc = tuple(jnp.asarray(s) for _, s in qs)
    got_d = _moe_dense(x, weights, ids, *qw, scales=sc)
    got_r = _moe_ragged(x, weights, ids, *qw, scales=sc)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(got_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(dense_ref),
                               rtol=0.12, atol=0.02)


def test_qwen3_moe_int8_generate(tiny_qwen3_moe_dir):
    """INT8 through the engine: attention AND expert stacks quantized."""
    import jax.numpy as jnp

    llm = LLM(model=tiny_qwen3_moe_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              quantization="int8")
    layers = llm.engine.worker.model_runner.executor.params["layers"]
    assert layers["we_gate"].dtype == jnp.int8
    assert "we_gate_scale" in layers and "we_down_scale" in layers
    out = llm.generate({"prompt_token_ids": [5, 77, 301, 44]},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 8
