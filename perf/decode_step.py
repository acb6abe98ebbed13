# SPDX-License-Identifier: Apache-2.0
"""Decompose decode cost on the real chip: raw chained device step time vs
window dispatch/fetch overhead.

Run ALONE on the TPU (single-tenant chip — see CLAUDE.md).

    python perf/decode_step.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    if len(sys.argv) > 1:
        os.environ["BENCH_BATCH"] = sys.argv[1]
    engine = bench.build_engine()
    B = bench.BATCH
    ex = engine.worker.model_runner.executor
    spec = ex.kv_spec
    PS = spec.block_size

    # Fill B sequences at 512 context each (bench steady state).
    CTX = 512
    pages_per_seq = CTX // PS + 1
    PPB = engine.config.bucketing.page_bucket(pages_per_seq)
    page_indices = np.zeros((B, PPB), np.int32)
    nxt = 1
    for b in range(B):
        page_indices[b, :pages_per_seq] = np.arange(nxt, nxt + pages_per_seq)
        nxt += pages_per_seq
    assert nxt <= spec.num_pages, (nxt, spec.num_pages)

    kv_lens0 = np.full(B, CTX, np.int32)
    positions0 = np.full(B, CTX, np.int32)
    first = np.ones(B, np.int32)
    temp = np.zeros(B, np.float32)
    tk = np.full(B, -1, np.int32)
    tp = np.ones(B, np.float32)

    def window(K, kv0):
        slot_table = np.zeros((K, B), np.int32)
        for k in range(K):
            slot_table[k] = (page_indices[np.arange(B),
                                          (kv0 + k) // PS] * PS
                             + (kv0 + k) % PS)
        return slot_table

    K = engine.config.scheduler.decode_window
    # Warm compile.
    h = ex.dispatch_decode_window(first, positions0, window(K, kv_lens0),
                                  kv_lens0, page_indices, B, temp, tk, tp)
    ex.fetch_decode_window(h)

    # A: full window dispatch + fetch (what the engine pays per window).
    ITER = 12
    # throwaway burst (tunnel warm-up)
    for _ in range(2):
        ex.fetch_decode_window(ex.dispatch_decode_window(
            first, positions0, window(K, kv_lens0), kv_lens0, page_indices,
            B, temp, tk, tp))
    t0 = time.perf_counter()
    for _ in range(ITER):
        h = ex.dispatch_decode_window(first, positions0,
                                      window(K, kv_lens0), kv_lens0,
                                      page_indices, B, temp, tk, tp)
        ex.fetch_decode_window(h)
    dt = (time.perf_counter() - t0) / ITER
    print(f"window(K={K}) dispatch+fetch: {dt*1e3:.2f} ms "
          f"({B*K/dt:.0f} tok/s)", flush=True)

    # B: chained windows, ONE fetch at the end (pure device + dispatch).
    t0 = time.perf_counter()
    for _ in range(ITER):
        h = ex.dispatch_decode_window(first, positions0,
                                      window(K, kv_lens0), kv_lens0,
                                      page_indices, B, temp, tk, tp)
    ex.fetch_decode_window(h)
    dt_chain = (time.perf_counter() - t0) / ITER
    print(f"window(K={K}) chained (1 fetch): {dt_chain*1e3:.2f} ms "
          f"({B*K/dt_chain:.0f} tok/s)  -> sync overhead "
          f"{(dt-dt_chain)*1e3:.2f} ms/window", flush=True)

    # C: per-step device time from a longer chain of single steps.
    STEPS = 64
    for _ in range(4):
        h = ex.dispatch_decode_window(first, positions0,
                                      window(1, kv_lens0), kv_lens0,
                                      page_indices, B, temp, tk, tp)
    ex.fetch_decode_window(h)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        h = ex.dispatch_decode_window(first, positions0,
                                      window(1, kv_lens0), kv_lens0,
                                      page_indices, B, temp, tk, tp)
    ex.fetch_decode_window(h)
    dt_step = (time.perf_counter() - t0) / STEPS
    print(f"single-step chained: {dt_step*1e3:.2f} ms/step "
          f"({B/dt_step:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
