# SPDX-License-Identifier: Apache-2.0
"""Lazy per-host sharded weight loading (models/sharded_weights.py).

On the virtual CPU mesh the lazy loader must produce parameters identical
to the eager loader (modulo the intentionally-skipped QKV/gate-up fusion)
and generate HF-greedy-identical tokens. Multi-host correctness rides on
the same make_array_from_callback path, with each process contributing its
addressable shards.
"""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


def test_lazy_matches_eager_params(tiny_llama_dir):
    import jax

    from vllm_neuron_tpu.engine.llm import build_engine_config
    from vllm_neuron_tpu.models.registry import get_model
    from vllm_neuron_tpu.models.sharded_weights import load_llama_sharded
    from vllm_neuron_tpu.parallel.mesh import build_mesh

    config = build_engine_config(tiny_llama_dir, dtype="float32",
                                 max_model_len=64, max_num_seqs=2,
                                 block_size=16, tensor_parallel_size=2)
    model = get_model(config)
    mesh = build_mesh(config.parallel)
    lazy = load_llama_sharded(model, tiny_llama_dir, mesh)

    eager = model.load_params(tiny_llama_dir)
    # Eager fuses q/k/v -> wqkv and gate/up -> wgu; lazy keeps them split.
    H = model.hidden_size
    nH, nKV, D = model.num_heads, model.num_kv_heads, model.head_dim
    wqkv = np.asarray(eager["layers"]["wqkv"])
    np.testing.assert_allclose(np.asarray(lazy["layers"]["wq"]),
                               wqkv[:, :, :nH * D])
    np.testing.assert_allclose(np.asarray(lazy["layers"]["wk"]),
                               wqkv[:, :, nH * D:(nH + nKV) * D])
    np.testing.assert_allclose(np.asarray(lazy["layers"]["wv"]),
                               wqkv[:, :, (nH + nKV) * D:])
    wgu = np.asarray(eager["layers"]["wgu"])
    I = model.intermediate_size
    np.testing.assert_allclose(np.asarray(lazy["layers"]["wg"]),
                               wgu[:, :, :I])
    np.testing.assert_allclose(np.asarray(lazy["layers"]["wu"]),
                               wgu[:, :, I:])
    for name in ("wo", "wd", "attn_norm", "mlp_norm"):
        np.testing.assert_allclose(np.asarray(lazy["layers"][name]),
                                   np.asarray(eager["layers"][name]))
    for name in ("embed", "final_norm", "lm_head"):
        np.testing.assert_allclose(np.asarray(lazy[name]),
                                   np.asarray(eager[name]))
    # Sharding actually happened: wq's output dim is split over the mesh.
    shard_shape = lazy["layers"]["wq"].addressable_shards[0].data.shape
    assert shard_shape[2] == nH * D // 2


def test_lazy_load_generates_hf_identical(tiny_llama_dir, monkeypatch):
    monkeypatch.setenv("VLLM_TPU_SHARDED_LOAD", "1")
    prompt = [5, 77, 301, 44, 12]
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              tensor_parallel_size=2)
    out = llm.generate({"prompt_token_ids": prompt},
                       SamplingParams(temperature=0.0, max_tokens=10,
                                      ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)
    ref = hf_greedy(tiny_llama_dir, prompt, 10)
    assert got[:len(ref)] == ref
