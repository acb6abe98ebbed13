# SPDX-License-Identifier: Apache-2.0
"""A/B: per-layer KV page scatter cost by cache dtype (run ALONE on TPU).

The b48+fp8 bench collapse (decode-phase 195 tok/s vs ~1,300 at bf16)
implicates the per-layer scatter into the 1-byte page array — TPU XLA
handles sub-word scatters poorly. Measures write_kv_pages with the cache
threaded as a donated carry (exactly the step program's structure: the
scan carries the cache, so the scatter updates in place) for bf16,
scale-less fp8, scaled fp8, and an int32-packed variant (4 fp8 lanes per
element) to size the fix.

    python perf/fp8_scatter_ab.py [B] [num_pages]
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vllm_neuron_tpu/perf"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vllm_neuron_tpu.ops.ragged_attention import FP8KVCache, write_kv_pages

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NUM_PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 1025
PS, HKV, DP = 32, 8, 128
SCAN, DISPATCHES = 32, 8


def main():
    from perf.timing import measure_rtt
    rtt = measure_rtt()
    print(f"rtt: {rtt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B, HKV, DP)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, DP)), jnp.bfloat16)
    slots = jnp.asarray(
        rng.choice(NUM_PAGES * PS, B, replace=False).astype(np.int32))

    def bench(name, make_cache, scatter):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(cache, kk):
            def body(_, c):
                cache, kk = c
                cache = scatter(cache, kk)
                pages = cache.pages if isinstance(cache, FP8KVCache) \
                    else cache
                probe = pages.ravel()[0].astype(jnp.float32)
                return (cache, kk + (probe * 1e-6).astype(kk.dtype))
            return jax.lax.fori_loop(0, SCAN, body, (cache, kk))

        cache, kk = run(make_cache(), k)
        jax.block_until_ready(kk)          # compile
        for _ in range(2):                 # throwaway burst
            cache, kk = run(cache, kk)
        _ = float(kk.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(DISPATCHES):
            cache, kk = run(cache, kk)
        _ = float(kk.ravel()[0])
        dt = max(time.perf_counter() - t0 - rtt, 0.0) \
            / (DISPATCHES * SCAN) * 1e3
        print(f"{name}: {dt:.3f} ms/scatter  (B={B} pages={NUM_PAGES})",
              flush=True)

    bench("bf16      ",
          lambda: jnp.zeros((NUM_PAGES, PS, 2 * HKV, DP), jnp.bfloat16),
          lambda c, kk: write_kv_pages(c, kk, v, slots))
    bench("fp8 raw   ",
          lambda: jnp.zeros((NUM_PAGES, PS, 2 * HKV, DP),
                            jnp.float8_e4m3fn),
          lambda c, kk: write_kv_pages(c, kk, v, slots))
    from vllm_neuron_tpu.ops.ragged_attention import SCALE_LANES
    bench("fp8 scaled",
          lambda: FP8KVCache(
              jnp.zeros((NUM_PAGES, PS, 2 * HKV, DP), jnp.float8_e4m3fn),
              jnp.zeros((NUM_PAGES, PS, SCALE_LANES), jnp.bfloat16)),
          lambda c, kk: write_kv_pages(c, kk, v, slots))

    # int32-packed: scatter [B, 2Hkv, DP/4] i32 rows built by bitcasting the
    # quantized fp8 values — the prospective fix if 1-byte scatters are slow.
    def scatter_packed(c, kk):
        kv_new = jnp.stack([kk, v], axis=2).reshape(B, 2 * HKV, DP)
        q8 = kv_new.astype(jnp.float8_e4m3fn)
        q32 = jax.lax.bitcast_convert_type(
            q8.reshape(B, 2 * HKV, DP // 4, 4), jnp.int32)
        flat = c.reshape(NUM_PAGES * PS, 2 * HKV, DP // 4)
        return flat.at[slots].set(q32, mode="drop",
                                  unique_indices=True).reshape(c.shape)

    bench("i32 packed",
          lambda: jnp.zeros((NUM_PAGES, PS, 2 * HKV, DP // 4), jnp.int32),
          scatter_packed)

    # Discriminators for the scaled-fp8 slowness (pages+scales = 4.6 ms at
    # 49184 pages while pages alone = 0.08): is it the [slots, 2Hkv]
    # bf16 minor-dim-16 scales array, or the two-leaf carry?
    def scatter_scales_only(c, kk):
        absmax = jnp.max(jnp.abs(kk.astype(jnp.float32)), axis=-1)
        scale = jnp.concatenate([absmax, absmax], axis=-1)  # [B, 2Hkv]
        flat = c.reshape(NUM_PAGES * PS, 2 * HKV)
        return flat.at[slots].set(
            scale.astype(c.dtype), mode="drop",
            unique_indices=True).reshape(c.shape)

    bench("scales m16",
          lambda: jnp.zeros((NUM_PAGES, PS, 2 * HKV), jnp.bfloat16),
          scatter_scales_only)

    def scatter_scales_128(c, kk):
        absmax = jnp.max(jnp.abs(kk.astype(jnp.float32)), axis=-1)
        scale = jnp.concatenate([absmax] * 16, axis=-1)  # [B, 128]
        flat = c.reshape(NUM_PAGES * PS, 128)
        return flat.at[slots].set(
            scale.astype(c.dtype), mode="drop",
            unique_indices=True).reshape(c.shape)

    # Lane-padded layout: one 128-wide row per slot (scales stored 8x
    # redundant / padded to the lane width).
    bench("scales m128",
          lambda: jnp.zeros((NUM_PAGES, PS, 128), jnp.bfloat16),
          scatter_scales_128)


if __name__ == "__main__":
    main()
