# SPDX-License-Identifier: Apache-2.0
"""In-program ablation of the decode step: where do the ~26 ms go?

Times chained single-step decode windows (one fetch at the end) with parts
of the layer body knocked out via monkeypatching, in ONE process so the
weights load once. Run ALONE on the TPU.

    python perf/step_ablate.py [batch] [variant ...]

Variants: full, dense (dense gather attention), noattn (attention ->
identity), nokv (KV scatter skipped), noattnkv (both).
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
    variants = sys.argv[2:] or ["full", "dense", "noattn", "nokv",
                                "noattnkv"]
    engine = bench.build_engine()
    B = bench.BATCH
    ex = engine.worker.model_runner.executor
    spec = ex.kv_spec
    PS = spec.block_size

    CTX = 512
    pages_per_seq = CTX // PS + 1
    PPB = engine.config.bucketing.page_bucket(pages_per_seq)
    page_indices = np.zeros((B, PPB), np.int32)
    nxt = 1
    for b in range(B):
        page_indices[b, :pages_per_seq] = np.arange(nxt, nxt + pages_per_seq)
        nxt += pages_per_seq
    kv_lens0 = np.full(B, CTX, np.int32)
    positions0 = np.full(B, CTX, np.int32)
    first = np.ones(B, np.int32)
    temp = np.zeros(B, np.float32)
    tk = np.full(B, -1, np.int32)
    tp = np.ones(B, np.float32)
    slot1 = (page_indices[np.arange(B), kv_lens0 // PS] * PS
             + kv_lens0 % PS)[None]

    from vllm_neuron_tpu.models import llama
    real_attn = llama.ragged_attention
    real_write = llama.write_kv_pages

    def timed(name):
        # Fresh program per variant (the cache key ignores the
        # monkeypatch). Drop EVERY decode-step entry by prefix rather
        # than reconstructing the exact key tuple — the key grew a
        # `cross` flag once already and a stale pop here silently
        # measures the first-compiled program for every variant.
        for k in [k for k in ex._fns
                  if k[:2] == ("step", "decode")]:
            ex._fns.pop(k, None)
        h = ex.dispatch_decode_window(first, positions0, slot1, kv_lens0,
                                      page_indices, B, temp, tk, tp)
        ex.fetch_decode_window(h)
        for _ in range(4):
            h = ex.dispatch_decode_window(first, positions0, slot1,
                                          kv_lens0, page_indices, B, temp,
                                          tk, tp)
        ex.fetch_decode_window(h)
        STEPS = 64
        t0 = time.perf_counter()
        for _ in range(STEPS):
            h = ex.dispatch_decode_window(first, positions0, slot1,
                                          kv_lens0, page_indices, B, temp,
                                          tk, tp)
        ex.fetch_decode_window(h)
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:>9}: {dt*1e3:6.2f} ms/step ({B/dt:5.0f} tok/s)",
              flush=True)

    for v in variants:
        llama.ragged_attention = real_attn
        llama.write_kv_pages = real_write
        os.environ.pop("VLLM_TPU_DECODE_ATTN", None)
        if v == "dense":
            from vllm_neuron_tpu.ops import ragged_attention as ra
            os.environ["VLLM_TPU_DECODE_ATTN"] = "dense"
            ra._use_pallas_decode.cache_clear()
        elif v in ("noattn", "noattnkv"):
            llama.ragged_attention = (
                lambda q, kv, meta, scale, *a, **k: q)
        if v in ("nokv", "noattnkv"):
            llama.write_kv_pages = lambda kv, k, vv, slots: kv
        timed(v)
        if v == "dense":
            from vllm_neuron_tpu.ops import ragged_attention as ra
            os.environ.pop("VLLM_TPU_DECODE_ATTN", None)
            ra._use_pallas_decode.cache_clear()


if __name__ == "__main__":
    main()
