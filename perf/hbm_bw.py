# SPDX-License-Identifier: Apache-2.0
"""HBM bandwidth ground truth for this chip (run ALONE on the TPU).

Three questions, bottom-up:
  1. What streaming bandwidth does plain XLA reach on big arrays?
     (y = x * 2 over N bytes: N read + N write.)
  2. What does a Pallas kernel reach with a W-deep sliding window of
     page-sized async copies (the decode-attention access pattern)?
  3. Does page size / window depth / locality change it?

Why: the decode kernels all land at ~0.9 ms/call for 84 MB of KV reads
(~93 GB/s effective) regardless of chunking — either every kernel shape
is leaving ~8x on the table, or the chip's reachable bandwidth is far
below the 819 GB/s v5e spec sheet and 0.9 ms IS the speed of light.
Every staged perf projection (rowblock, int4 weight traffic) scales with
the answer.

Methodology per CLAUDE.md: chain iterations, one scalar fetch at the end.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vllm_neuron_tpu/perf"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, x, iters=32, scan=1):
    y = fn(x)
    y.block_until_ready()
    for _ in range(4):
        y = fn(y)
    jax.block_until_ready(y)
    _ = float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    _ = float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters / scan


# ---------------------------------------------------------------------------
# 1. XLA streaming: y = x * 2 (read N + write N)
# ---------------------------------------------------------------------------

def xla_stream(nbytes):
    n = nbytes // 2  # bf16
    x = jnp.ones((n // 256, 256), jnp.bfloat16)
    f = jax.jit(lambda v: v * 2)
    dt = timeit(f, x)
    bw = 2 * nbytes / dt / 1e9
    print(f"xla_stream {nbytes/2**20:7.1f} MB: {dt*1e3:8.3f} ms  "
          f"{bw:7.1f} GB/s (r+w)", flush=True)


# 1b. XLA reduction: y = sum(x) (read N only, no write traffic)
def xla_reduce(nbytes):
    n = nbytes // 2
    x = jnp.ones((n // 256, 256), jnp.bfloat16)
    f = jax.jit(lambda v: v.at[0, 0].set(jnp.sum(v, dtype=jnp.float32)
                                         .astype(v.dtype)))
    dt = timeit(f, x)
    bw = nbytes / dt / 1e9
    print(f"xla_reduce {nbytes/2**20:7.1f} MB: {dt*1e3:8.3f} ms  "
          f"{bw:7.1f} GB/s (read)", flush=True)


# ---------------------------------------------------------------------------
# 2. Pallas page-copy throughput with a W-deep window
# ---------------------------------------------------------------------------

def pallas_pages(kv, pages, W, label, reps=1):
    """Stream T page-copies with a W-deep in-flight window, reps times."""
    T = pages.shape[0]
    NP, ps, H2, Dp = kv.shape
    page_bytes = ps * H2 * Dp * kv.dtype.itemsize
    total = T * reps * page_bytes

    def kernel(pages_ref, x_ref, kv_hbm, o_ref, buf, sem):
        TT = T * reps

        def start(i, slot):
            pltpu.make_async_copy(
                kv_hbm.at[pages_ref[jax.lax.rem(i, T)]],
                buf.at[slot], sem.at[slot]).start()

        def wait(slot):
            pltpu.make_async_copy(
                kv_hbm.at[0], buf.at[slot], sem.at[slot]).wait()

        for w in range(min(W, TT)):
            start(w, w)

        def body(i, c):
            slot = jax.lax.rem(i, W)
            wait(slot)

            @pl.when(i + W < TT)
            def _():
                start(i + W, slot)
            return c

        jax.lax.fori_loop(0, TT, body, 0)
        # bf16 scalar extracts don't lower on Mosaic; reduce a 2-D slice.
        o_ref[...] = x_ref[...] + jnp.mean(buf[0, 0].astype(jnp.float32))

    f = jax.jit(functools.partial(
        pl.pallas_call,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, ps, H2, Dp), kv.dtype),
                pltpu.SemaphoreType.DMA((W,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
    )(kernel))

    g = lambda x: f(pages, x, kv)
    dt = timeit(g, jnp.zeros((8, 128), jnp.float32))
    bw = total / dt / 1e9
    print(f"pallas {label} W={W:2d} ps={ps}: {dt*1e3:8.3f} ms for "
          f"{total/2**20:6.1f} MB  {bw:7.1f} GB/s", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("xla", "all"):
        for mb in (64, 256, 1024):
            xla_stream(mb * 2**20)
        for mb in (64, 256, 1024):
            xla_reduce(mb * 2**20)

    if which in ("pallas", "all"):
        rng = np.random.default_rng(0)
        # Real KV page geometry: [ps, 2*Hkv, Dp] bf16.
        for ps in (32, 128):
            NP = 64 * 2**20 // (ps * 16 * 128 * 2)  # ~64 MB of pages
            kv = jnp.asarray(
                rng.standard_normal((NP, ps, 16, 128)), jnp.bfloat16)
            T = min(NP, 640)
            scattered = jnp.asarray(
                rng.choice(NP, T, replace=False).astype(np.int32))
            seq = jnp.arange(T, dtype=jnp.int32)
            for W in (2, 4, 8, 16):
                pallas_pages(kv, scattered, W, "scatter", reps=16)
            pallas_pages(kv, seq, 8, "sequent", reps=16)


if __name__ == "__main__":
    main()
