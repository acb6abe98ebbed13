# SPDX-License-Identifier: Apache-2.0
"""Device-op profile of the decode step: where do the ~31 ms actually go?

step_ablate's monkeypatch deltas went unreliable once attention reached
the few-ms range (knocking ops out changes XLA's overlap). This captures a
jax.profiler perfetto trace of a few decode windows and sums DEVICE slice
durations by op name — ground truth for the step budget.

Run ALONE on the TPU:  python perf/step_profile.py [batch] [nsteps]
"""
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    os.environ["BENCH_BATCH"] = str(B)
    NSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    engine = bench.build_engine()
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
    slot1 = (page_indices[np.arange(B), kv_lens0 // PS] + 0) * 0 + \
        (page_indices[np.arange(B), kv_lens0 // PS] * PS
         + kv_lens0 % PS)[None]

    def steps(n):
        h = None
        for _ in range(n):
            h = ex.dispatch_decode_window(first, positions0, slot1,
                                          kv_lens0, page_indices, B, temp,
                                          tk, tp)
        ex.fetch_decode_window(h)

    steps(6)  # compile + warm
    import jax
    trace_dir = "/tmp/vllm_tpu_step_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    steps(NSTEP)
    wall = (time.perf_counter() - t0) / NSTEP
    jax.profiler.stop_trace()
    print(f"wall: {wall*1e3:.2f} ms/step over {NSTEP} steps", flush=True)

    # Find the perfetto trace and sum device slices by name.
    path = None
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith("perfetto_trace.json.gz"):
                path = os.path.join(root, f)
    assert path, f"no perfetto trace under {trace_dir}"
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    # Identify device-side tracks (TPU op events carry 'dur'; host tracks
    # are filtered by process/thread names when present).
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        by_name[e["name"]] += e["dur"]
        total += e["dur"]
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    print(f"device total: {total/1e3/NSTEP:.2f} ms/step "
          f"({len(rows)} distinct ops)  [pids: "
          f"{[names.get(p, p) for p in dev_pids] or 'ALL'}]", flush=True)
    for name, dur in rows[:40]:
        print(f"  {dur/1e3/NSTEP:8.3f} ms/step  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
