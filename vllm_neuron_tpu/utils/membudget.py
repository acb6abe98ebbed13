# SPDX-License-Identifier: Apache-2.0
"""Config-time device-memory budget (VERDICT r4 #6).

Near-ceiling configs used to fail at the DEVICE, not at config time:
b96@672 OOM'd on an HLO temp, b88@640 hit FailedPrecondition at the first
decode dispatch after wedging the chip for three tries, and b80@704
flaky-OOM'd at engine warm ~1 run in 4 (docs/PERF_NOTES.md "b80" section).
The reference validates block arithmetic up front
(/root/reference/vllm_neuron/worker/neuronx_distributed_model_loader.py:834-867)
but has no byte budget either. This module estimates

    weights (analytic, by family/quant) + KV pool (+ scales, + draft KV)
      + a calibrated HLO-temp / allocator-slack margin

against the device's reported memory limit at ENGINE BUILD, and downshifts
the KV pool (or rejects) before anything touches the device.

Calibration points (16 GiB v5e, 8B INT8 int8-head bench family):
  - b80 @ 672 (pool 6.57 GiB est): stable     -> must PASS
  - b80 @ 704 (pool 6.88 GiB est): flaky OOM  -> must FAIL
  - b88 @ 640 (pool 6.88 GiB est): device err -> must FAIL
  - b96 @ 672 (pool 7.88 GiB est): device OOM -> must FAIL
The margin constants below split these points; re-calibrate if the
runtime's reported bytes_limit changes.
"""
from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)

# Allocator slack on the measured weight residency: the 8B INT8 analytic
# estimate is 7.97 GiB while the chip shows ~8.6 GiB resident after load
# (buffer rounding, scales, rope caches, executor side buffers).
_WEIGHT_SLACK = 1.08
# HLO-temp + headroom margin: b80@704 at ~15.5/16 GiB flaky-OOMs at warm
# while b80@672 at ~15.2/16 is stable (docs/PERF_NOTES.md) — the usable
# line sits between them.
_MARGIN_FRACTION = 0.047  # ~0.75 GiB of a 16 GiB chip


def estimate_weight_bytes(config) -> Optional[int]:
    """Analytic post-quantization weight residency for the dense
    llama/qwen-family architectures the single-chip bench serves. Returns
    None for families without the arithmetic (no check then — multimodal /
    MoE single-chip configs are far from the ceiling today)."""
    hf = config.model.hf_config
    needed = ("hidden_size", "intermediate_size", "num_hidden_layers",
              "num_attention_heads", "vocab_size")
    if any(getattr(hf, k, None) is None for k in needed):
        return None
    if getattr(hf, "num_experts", None) or getattr(
            hf, "num_local_experts", None):
        return None  # MoE: expert sharding changes residency per device
    h = hf.hidden_size
    inter = hf.intermediate_size
    L = hf.num_hidden_layers
    kvh = getattr(hf, "num_key_value_heads", None) or hf.num_attention_heads
    head_dim = getattr(hf, "head_dim", None) or h // hf.num_attention_heads
    v = hf.vocab_size

    quant = config.quant.quantization if config.quant.enabled else None
    witem = {"int8": 1, "fp8": 1, "int4": 0.5}.get(quant, 2)
    layer_params = (h * (hf.num_attention_heads * head_dim
                         + 2 * kvh * head_dim)          # qkv
                    + (hf.num_attention_heads * head_dim) * h   # o
                    + 3 * h * inter)                    # gate/up/down
    embed = v * h * 2  # bf16 embed (never quantized)
    head_item = 1 if (quant and getattr(config.quant, "quantize_lm_head",
                                        False)) else 2
    head = 0 if getattr(hf, "tie_word_embeddings", False) else \
        v * h * head_item
    total = int(layer_params * L * witem + embed + head)
    if config.speculative.enabled:
        # Eagle draft: one decoder layer + the 2H->H feature fc, loaded in
        # the model dtype (bf16) — ~0.5 GiB at 8B geometry.
        total += int((layer_params + 2 * h * h) * 2)
    return int(total * _WEIGHT_SLACK)


def estimate_kv_bytes(config, num_blocks: Optional[int] = None) -> int:
    """KV pool bytes for a given block count (defaults to the configured
    pool), including fp8 per-slot scale planes and the draft cache when
    speculation is on (the draft shares the page table => same page
    count)."""
    hf = config.model.hf_config
    L = config.model.num_layers
    kvh = config.model.num_kv_heads
    head_dim = config.model.head_dim
    # Pallas lane padding (ops/ragged_attention.padded_head_dim).
    head_dim = max(128, -(-head_dim // 128) * 128)
    blocks = (num_blocks if num_blocks is not None
              else config.cache.num_blocks) or 0
    pages = blocks + 1  # + internal null page
    kv_dtype = config.cache.kv_cache_dtype
    item = 1 if kv_dtype == "fp8" else 2
    per_page = config.cache.block_size * 2 * kvh * head_dim * item
    total = L * pages * per_page
    if kv_dtype == "fp8":
        # Per-slot lane-replicated bf16 scales [L, pages, ps, SCALE_LANES].
        total += L * pages * config.cache.block_size * 128 * 2
    if config.speculative.enabled:
        # Draft cache: same page table, draft layer count unknown until
        # load for checkpoint drafts — 1 Eagle layer is the family norm.
        total += pages * per_page
    return int(total)


# HBM per chip by device kind, used when the runtime reports no memory
# stats (the axon-tunneled v5e returns memory_stats() = None). Reference
# analogue: the 20 GiB fallback when the Neuron runtime probe fails
# (neuron_worker.py:63).
_HBM_BY_KIND = {
    "TPU v5 lite": 16 * 2**30,   # v5e
    "TPU v5e": 16 * 2**30,
    "TPU v5p": 95 * 2**30,
    "TPU v4": 32 * 2**30,
    "TPU v6 lite": 32 * 2**30,   # v6e / Trillium
}


def device_memory_limit() -> Optional[int]:
    """Reported accelerator memory limit; falls back to the device-kind
    table when the runtime exposes no stats. None on CPU (virtual meshes)
    or unknown accelerators. VLLM_TPU_MEMORY_LIMIT_BYTES overrides."""
    import os
    env = os.environ.get("VLLM_TPU_MEMORY_LIMIT_BYTES")
    if env:
        return int(env) or None
    try:
        import jax
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return None
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if limit:
            return limit
        return _HBM_BY_KIND.get(getattr(dev, "device_kind", ""), None)
    except Exception:
        return None


def apply_memory_budget(config, limit_bytes: Optional[int] = None) -> None:
    """Validate (and if needed downshift) the KV pool against the device
    budget BEFORE any device allocation. Mutates config.cache.num_blocks
    on downshift; raises ValueError when even a one-sequence pool cannot
    fit. No-op when the limit or the weight estimate is unavailable, or
    under multi-device parallelism (per-device residency math differs)."""
    if config.parallel.world_size > 1 or config.parallel.devices is not None:
        return
    if limit_bytes is None:
        limit_bytes = device_memory_limit()
    if not limit_bytes:
        return
    weights = estimate_weight_bytes(config)
    if weights is None:
        return
    usable = int(limit_bytes * (1 - _MARGIN_FRACTION))
    kv = estimate_kv_bytes(config)
    total = weights + kv
    gib = 2**30
    if total <= usable:
        logger.info(
            "memory budget OK: weights ~%.2f GiB + KV pool %.2f GiB = "
            "%.2f <= usable %.2f GiB (limit %.2f)", weights / gib, kv / gib,
            total / gib, usable / gib, limit_bytes / gib)
        return
    # Downshift: largest pool that fits.
    blocks = config.cache.num_blocks
    per_block = estimate_kv_bytes(config, 1) - estimate_kv_bytes(config, 0)
    fixed = estimate_kv_bytes(config, 0)
    fit_blocks = int((usable - weights - fixed) // per_block) \
        if per_block > 0 else 0
    from vllm_neuron_tpu.config import cdiv
    one_seq = cdiv(config.model.max_model_len, config.cache.block_size)
    if fit_blocks < one_seq:
        raise ValueError(
            f"config does not fit device memory: weights ~"
            f"{weights / gib:.2f} GiB + KV pool {kv / gib:.2f} GiB "
            f"({blocks} blocks) > usable {usable / gib:.2f} GiB "
            f"(limit {limit_bytes / gib:.2f}, margin "
            f"{_MARGIN_FRACTION:.1%}); even a one-sequence pool "
            f"({one_seq} blocks) cannot fit. Reduce max_model_len, "
            f"max_num_seqs, or quantize.")
    logger.warning(
        "memory budget: weights ~%.2f GiB + KV pool %.2f GiB (%d blocks) "
        "= %.2f GiB exceeds usable %.2f GiB (limit %.2f) — downshifting "
        "pool to %d blocks (%.2f GiB). Requests beyond the shrunk pool "
        "will be preempted; reduce max_num_seqs or max_model_len to "
        "avoid this.", weights / gib, kv / gib, blocks,
        (weights + kv) / gib, usable / gib, limit_bytes / gib, fit_blocks,
        (fixed + fit_blocks * per_block) / gib)
    config.cache.num_blocks = fit_blocks
