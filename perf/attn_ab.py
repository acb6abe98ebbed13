# SPDX-License-Identifier: Apache-2.0
"""A/B microbenchmark: Pallas paged decode attention vs dense page-gather.

Run ALONE on the TPU (single-tenant chip — see CLAUDE.md). Methodology:
chain ITER iterations feeding the output back into q, fetch ONE scalar at
the end (block_until_ready alone under-reports through the axon tunnel).

    python perf/attn_ab.py [dense|pallas|both] [kv_len] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache (the executor sets this up for serving; perf
# scripts must opt in themselves or every run re-compiles through the slow
# remote compile service).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vllm_neuron_tpu/perf"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vllm_neuron_tpu.ops.decode_attention import (
    decode_paged_attention, decode_paged_attention_flat,
    decode_paged_attention_rowblock, visible_range)
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                  _decode_attention_dense)

# Llama-3.1-8B decode shapes at the bench config.
B = int(sys.argv[3]) if len(sys.argv) > 3 else 32
HQ, HKV, DP = 32, 8, 128
PS = int(os.environ.get("AB_PAGE_SIZE", "32"))
assert PS > 0 and 32 * 1024 % PS == 0, \
    f"AB_PAGE_SIZE={PS} must be positive and divide 32768"
KV_LEN_EARLY = int(sys.argv[2]) if len(sys.argv) > 2 else 640
# Pool sized to fit one contiguous run per row (engine-like layout) even
# at large B; the old fixed 1025-page pool capped contiguous mode at b50.
NUM_PAGES = max(32 * 1024 // PS + 1,
                B * (-(-KV_LEN_EARLY // PS)) + 1)
# NOTE: the default AB_FUSED_CS / AB_ROWBLOCK_RS chunk lists below assume
# PS=32; with a larger AB_PAGE_SIZE the same C/R values move proportionally
# more KV per iteration and can blow the ~16MB scoped-VMEM double-buffer
# limit at compile. Scale them by 32/PS when sweeping other page sizes.
KV_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 640
PP_BUCKET = -(-KV_LEN // PS)  # exact page need (bucket rounding separate)
# AB_SCAN=L: wrap each variant in an in-program fori_loop of L chained
# calls (one dispatch for L kernel invocations) — measures the IN-PROGRAM
# per-call cost the step program actually pays per layer. The plain chain
# of separate dispatches carries a ~0.3-0.4 ms/call tunnel-dispatch floor
# that masks sub-ms kernel differences.
SCAN = int(os.environ.get("AB_SCAN", "8"))
ITER = 16 if SCAN else 64
SM = 1.0 / np.sqrt(DP)


def setup(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, HQ, DP)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((NUM_PAGES, PS, 2 * HKV, DP)),
                     dtype)
    kv_lens = jnp.full((B,), KV_LEN, jnp.int32)
    pages = np.zeros((B, PP_BUCKET), np.int32)
    if os.environ.get("AB_PAGES", "contig") == "contig":
        # Consecutive pool pages per row — the ENGINE's real layout (the
        # allocator hands out a prefill's blocks as one ascending run),
        # which the flat kernel's contiguous-run DMA fast path detects.
        # AB_PAGES=random measures the per-page-DMA fallback.
        nxt = 1
        for b in range(B):
            pages[b] = np.arange(nxt, nxt + PP_BUCKET)
            nxt += PP_BUCKET
        assert nxt <= NUM_PAGES, "pool too small for contiguous rows"
    else:
        for b in range(B):
            pages[b] = rng.choice(np.arange(1, NUM_PAGES), PP_BUCKET,
                                  replace=False)
    return q, kv, kv_lens, jnp.asarray(pages)


# AB_KV=fp8: scaled-FP8 cache — pages in e4m3 + [pages, ps, 2Hkv] bf16
# scales threaded to the kernels (isolates the b48+fp8 bench collapse:
# scatter measured clean, so the suspect is the scaled read path).
KV_MODE = os.environ.get("AB_KV", "bf16")


def setup_scales():
    from vllm_neuron_tpu.ops.ragged_attention import SCALE_LANES
    rng = np.random.default_rng(1)
    s = rng.uniform(0.01, 0.05, (NUM_PAGES, PS, 1))
    return jnp.asarray(np.broadcast_to(s, (NUM_PAGES, PS, SCALE_LANES)),
                       jnp.bfloat16)


_RTT = None


def run(name, fn, q0):
    """RTT-corrected per-call time via the shared harness (perf/timing.py):
    SCAN in-program calls per dispatch x ITER dispatches, one fetch."""
    global _RTT
    from perf.timing import measure_rtt, time_op
    if _RTT is None:
        _RTT = measure_rtt()
        print(f"rtt: {_RTT*1e3:.1f} ms", flush=True)
    dt = time_op(fn, q0, scan=max(SCAN, 1), dispatches=ITER,
                 rtt=_RTT) * 1e3
    print(f"{name}: {dt:.3f} ms/call  (B={B} kv_len={KV_LEN} "
          f"PP={PP_BUCKET} iters={ITER} scan={SCAN})", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if KV_MODE == "fp8":
        q, kv, kv_lens, pages = setup(jnp.float8_e4m3fn)
        scales = setup_scales()
        sc = {"kv_scales": scales}
        print("kv: scaled fp8 (e4m3 pages + bf16 scales)", flush=True)
    else:
        q, kv, kv_lens, pages = setup()
        sc = {}

    if which in ("dense", "both"):
        from vllm_neuron_tpu.ops.ragged_attention import FP8KVCache
        meta = RaggedMeta(
            slot_mapping=jnp.full((B,), -1, jnp.int32),
            kv_lens=kv_lens, page_indices=pages,
            cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
            num_seqs=jnp.asarray([B], jnp.int32))
        kvd = FP8KVCache(kv, sc["kv_scales"]) if sc else kv
        dense = jax.jit(lambda q: _decode_attention_dense(
            q, kvd, meta, SM, None).astype(q.dtype))
        run("dense ", dense, q)

    if which in ("pallas", "both"):
        lo, hi = visible_range(kv_lens)
        for c in (2, 4, 8):
            pal = jax.jit(lambda q, c=c: decode_paged_attention(
                q, kv, lo, hi, pages, num_kv_heads=HKV, sm_scale=SM,
                pages_per_chunk=c).astype(q.dtype))
            run(f"pallasC{c}", pal, q)

    if which in ("flat", "both"):
        lo, hi = visible_range(kv_lens)
        for c in (2, 4, 6):  # C>=16: 2*C*ps*2Hkv*Dp*2B double-buffer
            # alone hits the 16MB scoped-VMEM limit
            fl = jax.jit(lambda q, c=c: decode_paged_attention_flat(
                q, kv, lo, hi, pages, num_kv_heads=HKV, sm_scale=SM,
                pages_per_chunk=c, **sc).astype(q.dtype))
            run(f"flatC{c}", fl, q)

    if which in ("fused", "both"):
        lo, hi = visible_range(kv_lens)
        cs = tuple(int(x) for x in os.environ.get(
            "AB_FUSED_CS", "2,4,6,8").split(","))
        for c in cs:
            fu = jax.jit(lambda q, c=c: decode_paged_attention_flat(
                q, kv, lo, hi, pages, num_kv_heads=HKV, sm_scale=SM,
                pages_per_chunk=c, fused_gqa=True, **sc).astype(q.dtype))
            run(f"fusedC{c}", fu, q)

    if which in ("rowblock", "both"):
        lo, hi = visible_range(kv_lens)
        rs = tuple(int(x) for x in os.environ.get(
            "AB_ROWBLOCK_RS", "1,2").split(","))
        for r in rs:
            # VMEM double-buffer: 2*R*PP*ps*2Hkv*Dp*2B; R=1 @ 20 pages
            # of 32 slots = 10.5 MB (fits); R=2 = 21 MB blows the 16 MB
            # scoped limit (measured: compile OOM at 17.44M) — R>=2 only
            # fits at kv_len <= ~384.
            rb = jax.jit(lambda q, r=r: decode_paged_attention_rowblock(
                q, kv, lo, hi, pages, num_kv_heads=HKV, sm_scale=SM,
                rows_per_block=r, **sc).astype(q.dtype))
            run(f"rowblockR{r}", rb, q)


if __name__ == "__main__":
    main()
