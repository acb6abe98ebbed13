# SPDX-License-Identifier: Apache-2.0
"""Headline benchmark: steady-state decode throughput (tokens/sec/chip).

Runs the real serving decode path — paged block-KV attention over block
tables, continuous-batching shapes, bucketed programs — on a
TinyLlama-1.1B-architecture model (BASELINE.json config 1 class) with random
bf16 weights, batch 32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no benchmark numbers (BASELINE.json "published": {}),
so vs_baseline is measured against this repo's recorded round-1 number once
one exists; until then it is 1.0.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# Keep any ambient XLA flags; run wherever the driver points us (real TPU
# under axon; CPU fallback works too, just slower).
import jax

BATCH = 32
MAX_MODEL_LEN = 2048
BLOCK_SIZE = 32
CONTEXT_LEN = 512  # tokens of KV context per sequence during decode
DECODE_STEPS = 64
WARMUP_STEPS = 8
PREV_BEST = None  # set after the first recorded round


def build():
    from transformers import LlamaConfig

    from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                        EngineConfig, ModelConfig,
                                        SchedulerConfig)
    from vllm_neuron_tpu.models.registry import get_model
    from vllm_neuron_tpu.worker.executor import ModelExecutor

    # TinyLlama-1.1B architecture (BASELINE.json config 1).
    hf = LlamaConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_hidden_layers=22,
        num_attention_heads=32,
        num_key_value_heads=4,
        max_position_embeddings=MAX_MODEL_LEN,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hf.architectures = ["LlamaForCausalLM"]
    model_config = ModelConfig(model="__random__", tokenizer="__random__",
                               dtype="bfloat16", max_model_len=MAX_MODEL_LEN,
                               hf_config=hf)
    config = EngineConfig(
        model=model_config,
        cache=CacheConfig(block_size=BLOCK_SIZE,
                          enable_prefix_caching=True),
        scheduler=SchedulerConfig(max_num_seqs=BATCH),
        bucketing=BucketingConfig(
            context_encoding_buckets=[256, 512, 1024, 2048],
            token_generation_buckets=[BATCH]),
    )
    model = get_model(config)
    params = model.random_params(jax.random.PRNGKey(0))
    executor = ModelExecutor(model, config, params)
    return config, executor


def main():
    config, executor = build()
    spec = executor.kv_spec
    blocks_per_seq = CONTEXT_LEN // BLOCK_SIZE
    max_bps = spec.max_blocks_per_seq

    # Fill each sequence's KV with CONTEXT_LEN tokens via one prefill each
    # (also exercises/compiles the prefill program).
    rng = np.random.default_rng(0)
    block_tables = np.zeros((BATCH, max_bps), np.int32)
    for b in range(BATCH):
        blocks = 1 + b * max_bps + np.arange(max_bps, dtype=np.int32)
        block_tables[b] = blocks
        ids = rng.integers(1, 32000, size=(1, 512), dtype=np.int64)
        ids = ids.astype(np.int32)
        pos = np.arange(512, dtype=np.int32)[None]
        slots = (blocks[np.arange(512) // BLOCK_SIZE] * BLOCK_SIZE +
                 np.arange(512) % BLOCK_SIZE).astype(np.int32)[None]
        executor.run_prefill(ids, pos, slots, block_tables[b:b + 1],
                             seq_lens=np.array([CONTEXT_LEN], np.int32),
                             cached_lens=np.array([0], np.int32),
                             last_idx=CONTEXT_LEN - 1)

    def decode_step(step: int):
        ctx = CONTEXT_LEN + step
        ids = rng.integers(1, 32000, size=BATCH).astype(np.int32)
        positions = np.full(BATCH, ctx, np.int32)
        block_idx, off = divmod(ctx, BLOCK_SIZE)
        slots = (block_tables[:, block_idx] * BLOCK_SIZE + off).astype(
            np.int32)
        context_lens = np.full(BATCH, ctx + 1, np.int32)
        return executor.run_decode(ids, positions, slots, block_tables,
                                   context_lens)

    for i in range(WARMUP_STEPS):
        decode_step(i)

    start = time.perf_counter()
    for i in range(DECODE_STEPS):
        decode_step(WARMUP_STEPS + i)
    elapsed = time.perf_counter() - start

    tokens_per_sec = BATCH * DECODE_STEPS / elapsed
    vs = tokens_per_sec / PREV_BEST if PREV_BEST else 1.0
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_tinyllama1.1b_bf16_b32",
        "value": round(tokens_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
