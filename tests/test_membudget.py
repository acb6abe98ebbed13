# SPDX-License-Identifier: Apache-2.0
"""Config-time device-memory budget (VERDICT r4 #6): near-ceiling configs
must be rejected or downshifted at ENGINE BUILD, not by a device OOM /
FailedPrecondition at the first dispatch. The synthetic 16-GiB limit
replays the chip calibration points from docs/PERF_NOTES.md: b80@672
stable (PASS), b80@704 flaky-OOM and b96@672 device-OOM (must not pass
unchanged). Reference analogue: up-front block-arithmetic validation,
model_loader.py:834-867."""
import logging

import pytest
from transformers import LlamaConfig

from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                    EngineConfig, ModelConfig, QuantConfig,
                                    SchedulerConfig)
from vllm_neuron_tpu.utils.membudget import (apply_memory_budget,
                                             estimate_kv_bytes,
                                             estimate_weight_bytes)

GIB = 2**30
LIMIT_16G = 16 * GIB

LLAMA8B = dict(vocab_size=128256, hidden_size=4096, intermediate_size=14336,
               num_hidden_layers=32, num_attention_heads=32,
               num_key_value_heads=8, rope_theta=500000.0)


def _cfg(batch, max_len, quant="int8"):
    hf = LlamaConfig(max_position_embeddings=max_len,
                     tie_word_embeddings=False, **LLAMA8B)
    hf.architectures = ["LlamaForCausalLM"]
    return EngineConfig(
        model=ModelConfig(model="__random__", tokenizer="__random__",
                          dtype="bfloat16", max_model_len=max_len,
                          hf_config=hf, load_format="random"),
        cache=CacheConfig(block_size=32, enable_prefix_caching=True),
        scheduler=SchedulerConfig(max_num_seqs=batch),
        bucketing=BucketingConfig(context_encoding_buckets=[512],
                                  token_generation_buckets=[batch]),
        quant=QuantConfig(quantization=quant, quantize_lm_head=True),
    )


def test_estimates_are_chip_calibrated():
    cfg = _cfg(80, 672)
    w = estimate_weight_bytes(cfg)
    # ~8.6 GiB measured resident for 8B INT8 + int8 head + bf16 embed.
    assert 8.2 * GIB < w < 9.0 * GIB, w / GIB
    kv = estimate_kv_bytes(cfg)
    # 21 blocks/seq * 80 = 1680 blocks (+null) at 128 KiB/page/layer.
    assert 6.3 * GIB < kv < 6.9 * GIB, kv / GIB


def test_known_good_config_passes_unchanged():
    cfg = _cfg(80, 672)
    blocks = cfg.cache.num_blocks
    apply_memory_budget(cfg, limit_bytes=LIMIT_16G)
    assert cfg.cache.num_blocks == blocks  # untouched


@pytest.mark.parametrize("batch,max_len", [(80, 704), (88, 640), (96, 672)])
def test_known_bad_configs_downshift(batch, max_len, caplog):
    cfg = _cfg(batch, max_len)
    blocks = cfg.cache.num_blocks
    with caplog.at_level(logging.WARNING):
        apply_memory_budget(cfg, limit_bytes=LIMIT_16G)
    assert cfg.cache.num_blocks < blocks, \
        f"b{batch}@{max_len} must not pass at 16 GiB unchanged"
    assert any("downshift" in r.message for r in caplog.records)
    # The downshifted pool itself fits the budget.
    total = estimate_weight_bytes(cfg) + estimate_kv_bytes(cfg)
    assert total <= LIMIT_16G * 0.96


def test_hopeless_config_rejected():
    cfg = _cfg(80, 672, quant=None)  # bf16 8B: weights alone ~16 GiB
    with pytest.raises(ValueError, match="does not fit device memory"):
        apply_memory_budget(cfg, limit_bytes=LIMIT_16G)


def test_no_limit_is_a_noop():
    cfg = _cfg(96, 672)
    blocks = cfg.cache.num_blocks
    apply_memory_budget(cfg, limit_bytes=None)  # CPU / unknown device
    assert cfg.cache.num_blocks == blocks


def test_multi_device_is_a_noop():
    cfg = _cfg(96, 672)
    cfg.parallel.tensor_parallel_size = 2
    blocks = cfg.cache.num_blocks
    apply_memory_budget(cfg, limit_bytes=LIMIT_16G)
    assert cfg.cache.num_blocks == blocks
