# SPDX-License-Identifier: Apache-2.0
"""A/B microbenchmark: dequant-GEMM variants at 8B decode/prefill shapes.

Run ALONE on the TPU (single-tenant chip — see CLAUDE.md). Methodology:
chain ITER iterations feeding the output back into x's first rows and
fetch ONE scalar at the end (block_until_ready alone under-reports
through the axon tunnel).

    python perf/dequant_ab.py [decode|prefill] [M]

Variants timed per (K, N) projection shape of Llama-3.1-8B:
  bf16      — dense baseline (weights 2 bytes/elem)
  int8      — per-channel dequant via the XLA fused-convert path
  int4      — grouped packed-nibble Pallas kernel (weights 0.5 bytes/elem)
Expected on-chip: decode (M=32) time ratio ~ bytes ratio (HBM-bound);
prefill (M=512) roughly flat (MXU-bound at the bf16 rate).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vllm_neuron_tpu/perf"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vllm_neuron_tpu.ops.quant import (dequant_matmul,
                                       quantize_int4_grouped,
                                       quantize_per_channel)

MODE = sys.argv[1] if len(sys.argv) > 1 else "decode"
M = int(sys.argv[2]) if len(sys.argv) > 2 else (32 if MODE == "decode"
                                                else 512)
ITER = 64
# Llama-3.1-8B projection shapes (wqkv, wo, wgu, wd). AB_SHAPES=2,3
# selects a subset by index (resume after a compile-service drop).
SHAPES = [(4096, 6144), (4096, 4096), (4096, 28672), (14336, 4096)]
if os.environ.get("AB_SHAPES"):
    SHAPES = [SHAPES[int(i)] for i in os.environ["AB_SHAPES"].split(",")]


from perf.timing import measure_rtt, time_op

_RTT = None


def chain(fn, x0, iters=ITER):
    def wrapped(x):
        y = fn(x)
        # Feed output back into the input's leading columns to serialize.
        return x.at[:, :1].set(y[:, :1].astype(x.dtype) * 1e-3)
    return time_op(wrapped, x0, scan=iters, dispatches=16, rtt=_RTT)


def main():
    global _RTT
    rng = np.random.default_rng(0)
    _RTT = measure_rtt()
    print(f"mode={MODE} M={M} iters={ITER} rtt={_RTT*1e3:.1f}ms")
    # AB_ONLY=stacked: time only the stacked-kernel variants (the non-
    # stacked chains close over up to 4x450 MB weight stacks, which the
    # remote-compile service rejects with HTTP 413 at the larger shapes).
    only_stacked = os.environ.get("AB_ONLY") == "stacked"
    for K, N in SHAPES:
        w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)

        zero = 0.0
        t_bf = t_i8 = t_i8s = t_i4s = zero
        t4 = {"v1": zero, "v2": zero, "v3": zero}
        if not only_stacked:
            wbf = jnp.asarray(w, jnp.bfloat16)
            t_bf = chain(lambda x: jnp.dot(x, wbf,
                                           preferred_element_type=jnp.float32
                                           ).astype(jnp.bfloat16), x0)

            w8, s8 = quantize_per_channel(w, "int8")
            w8j, s8j = jnp.asarray(w8), jnp.asarray(s8)
            t_i8 = chain(lambda x: dequant_matmul(x, w8j, s8j), x0)

        w4, s4 = quantize_int4_grouped(w, 128)
        w4j, s4j = jnp.asarray(w4), jnp.asarray(s4)
        from vllm_neuron_tpu.ops.quant import _dequant_matmul_int4_pallas
        if not only_stacked:
            for variant in ("v1", "v2", "v3"):
                t4[variant] = chain(
                    lambda x, v=variant: _dequant_matmul_int4_pallas(
                        x, w4j, s4j, out_dtype=x.dtype, variant=v), x0)

        # E2E context replica: the model slices layer weights out of a
        # stacked [L, K, N] array INSIDE the layer scan. A Pallas custom
        # call cannot fuse that dynamic-slice (XLA materializes a copy
        # first — extra write+read of the whole weight); the XLA int8 dot
        # fuses it. Timed with a 4-layer stack, cycling slices.
        L = 4
        w4s = jnp.asarray(np.stack([w4] * L))
        s4s = jnp.asarray(np.stack([s4] * L))

        def sliced(fn, ws, ss):
            def call(x):
                i = (x[0, :1].astype(jnp.int32)[0] & 0x7FFF) % L
                return fn(x, jax.lax.dynamic_index_in_dim(ws, i, 0,
                                                          keepdims=False),
                          jax.lax.dynamic_index_in_dim(ss, i, 0,
                                                       keepdims=False))
            return call

        if not only_stacked:
            w8s = jnp.asarray(np.stack([w8] * L))
            s8s = jnp.asarray(np.stack([s8] * L))
            t_i8s = chain(sliced(
                lambda x, wi, si: dequant_matmul(x, wi, si), w8s, s8s), x0)
            t_i4s = chain(sliced(
                lambda x, wi, si: _dequant_matmul_int4_pallas(
                    x, wi, si, out_dtype=x.dtype, variant="v1"),
                w4s, s4s), x0)

        # Stacked (copy-free, layer index via scalar prefetch): N-tiled
        # block layout vs K-tiled contiguous chunks.
        from vllm_neuron_tpu.ops.quant import (
            _dequant_matmul_int4_ktiled_stacked,
            _dequant_matmul_int4_stacked_pallas)

        def stacked(fn):
            def call(x):
                i = (x[0, :1].astype(jnp.int32)[0] & 0x7FFF) % L
                return fn(x, w4s, s4s, i, out_dtype=x.dtype)
            return call

        t_blk = chain(stacked(_dequant_matmul_int4_stacked_pallas), x0)
        t_kt = chain(stacked(_dequant_matmul_int4_ktiled_stacked), x0)
        t_w4a8s = None
        if M >= 256:
            from vllm_neuron_tpu.ops.quant import \
                _dequant_matmul_int4_w4a8_stacked
            t_w4a8s = chain(stacked(_dequant_matmul_int4_w4a8_stacked), x0)

        hbm_bf = K * N * 2 / 460e9 * 1e6  # measured practical bw
        print(f"[{K:6d}x{N:6d}] bf16 {t_bf*1e6:8.1f}us  "
              f"int8 {t_i8*1e6:8.1f}us  "
              f"int4 v1 {t4['v1']*1e6:8.1f} v2 {t4['v2']*1e6:8.1f} "
              f"v3 {t4['v3']*1e6:8.1f}us  "
              f"sliced: int8 {t_i8s*1e6:8.1f} int4 {t_i4s*1e6:8.1f}us  "
              f"stacked: blk {t_blk*1e6:8.1f} ktiled {t_kt*1e6:8.1f}"
              + (f" w4a8 {t_w4a8s*1e6:8.1f}" if t_w4a8s else "") + "us  "
              f"(bf16 HBM floor ~{hbm_bf:.0f}us; int4 target ~{hbm_bf/4:.0f}us)")


if __name__ == "__main__":
    main()
