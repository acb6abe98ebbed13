#!/bin/bash
# Decode-kernel sweep runbook (run ALONE on the TPU — single-tenant chip).
# Phase 1: microbench A/B of fused big-C vs rowblock R at bench shapes.
# Phase 2: full bench.py with the winning variant (edit env below).
set -x
cd "$(dirname "$0")/.."
AB_FUSED_CS=4,8,20 AB_ROWBLOCK_RS=1,2 \
  timeout 3000 python perf/attn_ab.py fused 640 32
AB_ROWBLOCK_RS=1,2 \
  timeout 3000 python perf/attn_ab.py rowblock 640 32
