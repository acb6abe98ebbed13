#!/bin/bash
# Round-5 remaining chip measurements, SERIAL (single-tenant chip).
# Run from /root/repo with an idle host. Each step logs to /tmp/r5_*.log.
set -x
cd /root/repo
# 1. Spec greedy identity with the paged verify kernel (tinypy)
timeout 2400 python perf/spec_greedy_check.py 4 8 2>/tmp/r5_speccheck.err | tee /tmp/r5_speccheck.out
sleep 30
# 2. tinypy spec headline revalidation (K=4 W=8 vs windowed base)
BENCH_MODEL=tinypy timeout 1800 python bench.py 2>/tmp/r5_tinybase.err | tee /tmp/r5_tinybase.out
sleep 30
BENCH_MODEL=tinypy BENCH_SPEC=4 BENCH_SPEC_ROUNDS=8 timeout 1800 python bench.py 2>/tmp/r5_tinyspec.err | tee /tmp/r5_tinyspec.out
sleep 30
# 3. 8B spec overhead with the verify kernel (random draft, acceptance ~0)
BENCH_BATCH=64 BENCH_SPEC=4 BENCH_SPEC_ROUNDS=8 BENCH_RUNS=2 timeout 3600 python bench.py 2>/tmp/r5_spec8b.err | tee /tmp/r5_spec8b.out
sleep 30
# 4. Vision on chip (CLIP-L/14-336 Llava-class)
timeout 3600 python perf/vision_chip.py 2>/tmp/r5_vision.err | tee /tmp/r5_vision.out
sleep 30
# 5. On-chip ppl gates: bf16 + int4 g64 w4a16 + int4 g64 W4A8
timeout 2400 python -m vllm_neuron_tpu.tools.eval_ppl --model ckpt_tinypy --tokens ckpt_tinypy/val_tokens.npy --window 256 --max-tokens 65535 2>/dev/null | tee /tmp/r5_ppl_bf16.out
sleep 30
timeout 2400 python -m vllm_neuron_tpu.tools.eval_ppl --model ckpt_tinypy --tokens ckpt_tinypy/val_tokens.npy --window 256 --max-tokens 65535 --quantization int4 --int4-group-size 64 2>/dev/null | tee /tmp/r5_ppl_i4g64.out
sleep 30
VLLM_TPU_W8A8_MIN_ROWS=128 timeout 2400 python -m vllm_neuron_tpu.tools.eval_ppl --model ckpt_tinypy --tokens ckpt_tinypy/val_tokens.npy --window 256 --max-tokens 65535 --quantization int4 --int4-group-size 64 2>/dev/null | tee /tmp/r5_ppl_i4g64_w4a8.out
sleep 30
# 6. Memory budget fail-fast on chip: b96 must downshift (not OOM/wedge)
BENCH_BATCH=96 BENCH_RUNS=1 timeout 3000 python bench.py 2>/tmp/r5_b96.err | tee /tmp/r5_b96.out
grep -i "downshift" /tmp/r5_b96.err | head -2
sleep 30
# 7. Decode window 12 A/B (RTT share grew after the step got 25% faster)
BENCH_DECODE_WINDOW=12 timeout 3000 python bench.py 2>/tmp/r5_win12.err | tee /tmp/r5_win12.out
sleep 30
# 8. Chunked-prefill 2x investigation (device-op profile)
timeout 3600 python perf/prefill_profile.py 2048 2>/tmp/r5_prefprof.err | tee /tmp/r5_prefprof.out
sleep 30
# 9. Sampled-batch bench + chunked-topk A/B (temperature>0 path)
BENCH_TEMPERATURE=0.8 timeout 3000 python bench.py 2>/tmp/r5_sampled.err | tee /tmp/r5_sampled.out
sleep 30
VLLM_TPU_TOPK_CHUNKS=8 BENCH_TEMPERATURE=0.8 timeout 3000 python bench.py 2>/tmp/r5_sampled_chunktopk.err | tee /tmp/r5_sampled_chunktopk.out
sleep 30
# 10. Spec under ARRIVALS (VERDICT r4 #3 serving row): tinypy spec vs base
BENCH_MODEL=tinypy SERVE_SECS=30 SERVE_GEN=64 timeout 1800 python perf/serving_bench.py 15 30 2>/tmp/r5_servtiny.err | tee /tmp/r5_servtiny.out
sleep 30
BENCH_MODEL=tinypy BENCH_SPEC=4 BENCH_SPEC_ROUNDS=8 SERVE_SECS=30 SERVE_GEN=64 timeout 1800 python perf/serving_bench.py 15 30 2>/tmp/r5_servtinyspec.err | tee /tmp/r5_servtinyspec.out
sleep 30
# 11. Flash CE at the 512 bucket (bench prefill is 84% of W8A8 floor;
# flash wins at >=1024 — check 512)
VLLM_TPU_PREFILL_FLASH_MIN_T=512 BENCH_RUNS=2 timeout 3000 python bench.py 2>/tmp/r5_flash512.err | tee /tmp/r5_flash512.out
