# SPDX-License-Identifier: Apache-2.0
"""Multi-host lockstep serving: leader broadcasts, follower replays.

Two executors in one process simulate two hosts: the "leader" executor is
patched to believe it is host 0 of 2 and its broadcasts are captured; a
FollowerLoop wrapping the "follower" executor replays them. After a full
prefill + pipelined-decode-window sequence, both executors' KV caches and
device-resident carries must be bit-identical — the invariant that makes
SPMD multi-host execution correct (every host enters the same program with
the same inputs; reference contract:
vllm_neuron/worker/neuron_worker.py:68-69).
"""
import numpy as np
import pytest

from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                    EngineConfig, ModelConfig,
                                    SchedulerConfig)
from vllm_neuron_tpu.models.registry import get_model
from vllm_neuron_tpu.parallel import multihost
from vllm_neuron_tpu.parallel.multihost import FollowerLoop
from vllm_neuron_tpu.worker.executor import ModelExecutor


def _make_config():
    from transformers import LlamaConfig
    hf = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128)
    hf.architectures = ["LlamaForCausalLM"]
    return EngineConfig(
        model=ModelConfig(model="__x__", tokenizer="__x__",
                          dtype="float32", max_model_len=64, hf_config=hf,
                          load_format="random"),
        cache=CacheConfig(block_size=8, enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=4, decode_window=4),
        bucketing=BucketingConfig(context_encoding_buckets=[16],
                                  token_generation_buckets=[4]),
    )


class _FakeWorker:
    def __init__(self, executor):
        class _R:
            pass
        self.model_runner = _R()
        self.model_runner.executor = executor


@pytest.fixture()
def pair(monkeypatch):
    import jax
    config = _make_config()
    model = get_model(config)
    params = model.random_params(jax.random.PRNGKey(0))
    leader = ModelExecutor(model, config, params)
    follower = ModelExecutor(model, config,
                             model.random_params(jax.random.PRNGKey(0)))

    bundles = []
    monkeypatch.setattr(multihost, "is_leader", lambda: True)
    monkeypatch.setattr(multihost, "broadcast_step",
                        lambda payload: bundles.append(payload) or payload)
    leader._replicate_steps = True
    loop = FollowerLoop(_FakeWorker(follower))
    return leader, follower, loop, bundles


def _drain(loop, bundles):
    for b in bundles:
        assert loop.step(b)
    bundles.clear()


def _prefill_args(prompt_len=10, pages=(1, 2)):
    N = 16
    token_ids = np.zeros(N, np.int32)
    token_ids[:prompt_len] = np.arange(prompt_len) % 100 + 1
    positions = np.zeros(N, np.int32)
    positions[:prompt_len] = np.arange(prompt_len)
    slots = np.full(N, -1, np.int32)
    slots[:prompt_len] = [pages[p // 8] * 8 + p % 8
                          for p in range(prompt_len)]
    page_indices = np.zeros((1, 8), np.int32)
    page_indices[0, :len(pages)] = pages
    return dict(
        token_ids=token_ids, positions=positions, slot_mapping=slots,
        kv_lens=np.asarray([prompt_len], np.int32),
        page_indices=page_indices,
        cu_q_lens=np.asarray([0, prompt_len], np.int32), num_seqs=1,
        logits_indices=np.asarray([prompt_len - 1], np.int32),
        temperature=np.zeros(1, np.float32),
        top_k=np.full(1, -1, np.int32), top_p=np.ones(1, np.float32),
        return_logits=False, kind="prefill")


def test_follower_replays_to_identical_state(pair):
    leader, follower, loop, bundles = pair

    toks, _ = leader.run_step(**_prefill_args())
    assert len(bundles) == 1
    _drain(loop, bundles)

    # One pipelined decode window chained off host tokens, then a second
    # window chained off the DEVICE carry (CARRY_LAST path).
    first = np.asarray([int(toks[0]), 0, 0, 0], np.int32)
    common = dict(
        positions0=np.asarray([10, 0, 0, 0], np.int32),
        kv_lens0=np.asarray([11, 0, 0, 0], np.int32),
        page_indices=np.tile(np.asarray([1, 2, 3, 0, 0, 0, 0, 0],
                                        np.int32), (4, 1)),
        num_seqs=1,
        temperature=np.zeros(4, np.float32),
        top_k=np.full(4, -1, np.int32), top_p=np.ones(4, np.float32))
    slot_table = np.full((2, 4), -1, np.int32)
    slot_table[:, 0] = [8 + 2, 8 + 3]  # positions 10, 11 in page 1
    h1 = leader.dispatch_decode_window(first, slot_table=slot_table,
                                       **common)
    assert len(bundles) == 1 and isinstance(
        bundles[0]["kwargs"]["first_tokens"], np.ndarray)
    _drain(loop, bundles)

    slot_table2 = np.full((2, 4), -1, np.int32)
    slot_table2[:, 0] = [8 + 4, 8 + 5]
    common2 = dict(common)
    common2["positions0"] = np.asarray([12, 0, 0, 0], np.int32)
    common2["kv_lens0"] = np.asarray([13, 0, 0, 0], np.int32)
    h2 = leader.dispatch_decode_window(h1["last"], slot_table=slot_table2,
                                       **common2)
    assert bundles[0]["kwargs"]["first_tokens"] == multihost.CARRY_LAST
    _drain(loop, bundles)

    lt = leader.fetch_decode_window(h2)
    np.testing.assert_array_equal(
        np.asarray(leader.kv_pages), np.asarray(follower.kv_pages))
    np.testing.assert_array_equal(
        np.asarray(leader.carry_last), np.asarray(follower.carry_last))
    assert lt.shape == (2, 4)


def test_shutdown_bundle_exits(pair):
    _, _, loop, _ = pair
    assert loop.step({"op": "shutdown"}) is False
    assert loop.step(None) is False


def test_single_host_no_broadcast(monkeypatch):
    import jax
    config = _make_config()
    model = get_model(config)
    params = model.random_params(jax.random.PRNGKey(0))
    ex = ModelExecutor(model, config, params)
    assert ex._replicate_steps is False
    called = []
    monkeypatch.setattr(multihost, "broadcast_step",
                        lambda p: called.append(p))
    ex.run_step(**_prefill_args())
    assert called == []
