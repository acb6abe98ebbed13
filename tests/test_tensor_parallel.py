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


def test_sp_shards_activations(tiny_llama_dir):
    """SP must be a real mechanism, not just config validation: the lowered
    program carries token-axis sharding constraints on the residual stream
    (with_sharding_constraint -> @Sharding custom-calls), and they vanish
    when SP is off."""
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.config import (EngineConfig, ModelConfig,
                                        ParallelConfig)
    from vllm_neuron_tpu.models.registry import get_model
    from vllm_neuron_tpu.ops.ragged_attention import RaggedMeta
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS, build_mesh
    from vllm_neuron_tpu.parallel.sharding import (shard_params,
                                                   sp_sharding_for)

    config = EngineConfig(
        model=ModelConfig(model=tiny_llama_dir, tokenizer=tiny_llama_dir,
                          dtype="float32", max_model_len=128),
        parallel=ParallelConfig(tensor_parallel_size=2,
                                sequence_parallel=True))
    mesh = build_mesh(config.parallel, jax.devices("cpu")[:2])
    model = get_model(config)
    params = shard_params(model.load_params(tiny_llama_dir), mesh, model)

    N, S, PP = 16, 2, 4
    kv = jnp.zeros((model.num_layers, 8, 16, 2 * model.num_kv_heads, 128),
                   jnp.float32)
    meta = RaggedMeta(
        slot_mapping=jnp.full((N,), -1, jnp.int32),
        kv_lens=jnp.zeros((S,), jnp.int32),
        page_indices=jnp.zeros((S, PP), jnp.int32),
        cu_q_lens=jnp.zeros((S + 1,), jnp.int32),
        num_seqs=jnp.ones((1,), jnp.int32))
    args = (params, jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32),
            kv, meta)

    def lower():
        return jax.jit(
            lambda *a: model.forward(*a, kind="prefill",
                                     attn_backend="jnp")).lower(
                                         *args).as_text()

    base_hlo = lower()
    model.sp_sharding = sp_sharding_for(mesh)
    try:
        sp_hlo = lower()
    finally:
        model.sp_sharding = None
    # Shardy lowering: each constraint is an sdy.sharding_constraint op
    # splitting the token axis over the model mesh axis.
    token_sharded = 'sharding_constraint %'
    assert sp_hlo.count(token_sharded) > base_hlo.count(token_sharded)
    assert '[{"model"}, {}]' in sp_hlo


def test_tp2_int8_sharded(tiny_llama_dir):
    """Quantized weights + scales shard over the mesh and still generate."""
    got = _run(tiny_llama_dir, tensor_parallel_size=2, quantization="int8")
    base = _run(tiny_llama_dir, quantization="int8")
    assert got == base, f"tp2 int8 {got} vs single-dev int8 {base}"
