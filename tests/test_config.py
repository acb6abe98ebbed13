# SPDX-License-Identifier: Apache-2.0
"""Config-tree policy surface (reference analogue: test_platform.py's
override/default coverage plus model_loader.py:725-867 derivation and
validation rules — 131072/32 defaults, contiguous-KV fallback, block
arithmetic, SP/EP divisibility, feature exclusions, config-hash keying)."""
import pytest
from transformers import LlamaConfig

from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                    EngineConfig, ModelConfig,
                                    ParallelConfig, QuantConfig,
                                    SchedulerConfig, SpeculativeConfig)


def _hf(**kw):
    base = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=4096)
    base.update(kw)
    cfg = LlamaConfig(**base)
    cfg.architectures = ["LlamaForCausalLM"]
    return cfg


def _model(max_model_len=1024, **kw):
    return ModelConfig(model="__random__", tokenizer="__random__",
                       dtype="float32", max_model_len=max_model_len,
                       hf_config=_hf(**kw), load_format="random")


def _engine(**kw):
    kw.setdefault("model", _model())
    return EngineConfig(**kw)


def test_scheduler_reference_defaults():
    # reference: platform.py:188 (131072 budget), :196-201 (32 seqs).
    cfg = _engine()
    assert cfg.scheduler.max_num_batched_tokens == 131072
    assert cfg.scheduler.max_num_seqs == 32


def test_contiguous_kv_fallback_without_prefix_caching():
    # reference: platform.py:203-207 — block_size := max_model_len when
    # prefix caching is off.
    cfg = _engine(cache=CacheConfig(enable_prefix_caching=False))
    assert cfg.cache.block_size == cfg.model.max_model_len


def test_paged_default_with_prefix_caching():
    cfg = _engine(cache=CacheConfig(enable_prefix_caching=True))
    assert cfg.cache.block_size == 32


def test_prefix_caching_rejects_contiguous_layout():
    with pytest.raises(ValueError, match="paged layout"):
        _engine(cache=CacheConfig(enable_prefix_caching=True,
                                  block_size=1024))


def test_num_blocks_default_is_no_preemption_bound():
    # reference: model_loader.py:741-745 pa_num_blocks derivation.
    cfg = _engine(cache=CacheConfig(block_size=32),
                  scheduler=SchedulerConfig(max_num_seqs=4))
    assert cfg.cache.num_blocks == (1024 // 32) * 4


def test_num_blocks_overcommit_allowed_but_one_seq_floor_enforced():
    # Unlike the reference's hard reject (model_loader.py:834-867),
    # undersized pools are allowed (scheduler preempts) down to the
    # one-max-length-sequence floor.
    cfg = _engine(cache=CacheConfig(block_size=32, num_blocks=40),
                  scheduler=SchedulerConfig(max_num_seqs=4))
    assert cfg.cache.num_blocks == 40
    with pytest.raises(ValueError, match="one"):
        _engine(cache=CacheConfig(block_size=32, num_blocks=8))


def test_context_buckets_derived_and_capped():
    cfg = _engine()
    b = cfg.bucketing.context_encoding_buckets
    assert b[0] >= 128 and b[-1] == 1024
    assert b == sorted(set(b))


def test_user_buckets_extended_to_max_len():
    cfg = _engine(bucketing=BucketingConfig(
        context_encoding_buckets=[256, 512]))
    assert cfg.bucketing.context_encoding_buckets[-1] == 1024


def test_bucketing_disabled_collapses_to_max_shapes():
    cfg = _engine(bucketing=BucketingConfig(enable_bucketing=False),
                  scheduler=SchedulerConfig(max_num_seqs=8))
    assert cfg.bucketing.context_encoding_buckets == [1024]
    assert cfg.bucketing.token_generation_buckets == [8]
    assert len(cfg.bucketing.page_buckets) == 1


def test_page_bucket_selection_and_overflow():
    cfg = _engine(cache=CacheConfig(block_size=32))
    pb = cfg.bucketing.page_buckets
    assert pb[-1] == 1024 // 32
    assert cfg.bucketing.page_bucket(1) == pb[0]
    with pytest.raises(ValueError, match="exceed"):
        cfg.bucketing.page_bucket(pb[-1] + 1)


def test_tp_kv_head_divisibility():
    # GQA replication fallback allows tp % kv_heads == 0; tp=3 fits
    # neither direction for 2 KV heads.
    with pytest.raises(ValueError, match="num_kv_heads"):
        _engine(parallel=ParallelConfig(tensor_parallel_size=3))
    _engine(parallel=ParallelConfig(tensor_parallel_size=4))  # replicate ok


def test_sequence_parallel_divisibility():
    # reference: test/tiny/test_sequence_parallel.py:25-58.
    with pytest.raises(ValueError, match="divisible by the TP group"):
        _engine(parallel=ParallelConfig(tensor_parallel_size=2,
                                        sequence_parallel=True),
                bucketing=BucketingConfig(
                    context_encoding_buckets=[255]))


def test_expert_parallel_requires_moe():
    with pytest.raises(ValueError, match="MoE"):
        _engine(parallel=ParallelConfig(expert_parallel_size=2))


def test_spec_exclusions():
    spec = SpeculativeConfig(method="eagle", model="x",
                             num_speculative_tokens=3)
    assert spec.enabled
    with pytest.raises(ValueError, match="chunked prefill"):
        _engine(speculative=spec,
                scheduler=SchedulerConfig(enable_chunked_prefill=True))


def test_config_hash_keys_on_quant_and_buckets():
    a = _engine().config_hash()
    assert a == _engine().config_hash()  # stable across recreation
    assert a != _engine(
        quant=QuantConfig(quantization="int8")).config_hash()
    assert _engine(quant=QuantConfig(quantization="int4")).config_hash() != \
        _engine(quant=QuantConfig(quantization="int4",
                                  int4_group_size=64)).config_hash()
    assert a != _engine(bucketing=BucketingConfig(
        context_encoding_buckets=[256])).config_hash()
