#!/bin/bash
# Decode-perf sweep runbook (run ALONE on the TPU — single-tenant chip;
# run phases one at a time, serially, never concurrently).
set -x
cd "$(dirname "$0")/.."

# Phase 1: microbench A/B — fused big-C vs rowblock R at bench shapes.
AB_FUSED_CS=4,8,20 AB_ROWBLOCK_RS=1,2 \
  timeout 3000 python perf/attn_ab.py fused 640 32
AB_ROWBLOCK_RS=1,2 \
  timeout 3000 python perf/attn_ab.py rowblock 640 32

# Phase 2: full bench with the phase-1 winner (edit VLLM_TPU_DECODE_* to
# match), int8 baseline.
# VLLM_TPU_DECODE_KERNEL=rowblock timeout 6000 python bench.py

# Phase 3: INT4 weights (halved decode weight traffic; Pallas
# packed-nibble dequant-GEMM is the default on-chip path).
# BENCH_QUANT=int4 VLLM_TPU_DECODE_KERNEL=rowblock \
#   timeout 6000 python bench.py

# Phase 4: async decode-window chaining (hides the host RTT per window).
# BENCH_ASYNC_DECODE=1 VLLM_TPU_DECODE_KERNEL=rowblock \
#   timeout 6000 python bench.py

# Phase 5: packed single-transfer window dispatch (tunnel h2d cost).
# VLLM_TPU_PACKED_H2D=1 VLLM_TPU_DECODE_KERNEL=rowblock \
#   timeout 6000 python bench.py

# Phase 6: batch sweep at the winning variant combo (weights traffic
# amortizes over rows; fp8 KV frees HBM for the bigger pool).
# BENCH_BATCH=48 BENCH_KV_DTYPE=fp8 BENCH_QUANT=int4 \
#   VLLM_TPU_DECODE_KERNEL=rowblock VLLM_TPU_PACKED_H2D=1 \
#   timeout 6000 python bench.py

# Phase 0 (run first, ~2 min): dequant-GEMM microbench — confirms the
# int4 kernel actually halves decode weight time before the full benches.
# timeout 1800 python perf/dequant_ab.py decode 32
# timeout 1800 python perf/dequant_ab.py prefill 512
