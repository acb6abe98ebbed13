# SPDX-License-Identifier: Apache-2.0
"""Device-op profile of prefill programs: why does a 2048-token CHUNK
program run ~2x slower than the same-size CE bucket? (round-4 open
question: 7.5k vs 15.7k prefill tok/s with chunked prefill on).

Traces one whole-prompt CE program and one chunked-prefill program at the
same token count and prints per-op device sums side by side.

Run ALONE on the TPU:  python perf/prefill_profile.py [tokens]
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


def profile_engine(tag, chunked, tokens):
    os.environ["BENCH_BATCH"] = "8"
    os.environ["BENCH_PROMPT_LEN"] = str(tokens)
    os.environ["BENCH_MAX_LEN"] = str(tokens + 256)
    os.environ["BENCH_CHUNKED"] = "1" if chunked else "0"
    os.environ["BENCH_CHUNK_SIZE"] = str(tokens)
    import importlib

    import bench
    importlib.reload(bench)
    engine = bench.build_engine()
    from vllm_neuron_tpu.sampling.params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        detokenize=False)
    rng = np.random.default_rng(0)

    def run(n, t0=""):
        for r in range(n):
            engine.add_request(
                f"p{tag}{t0}{r}",
                rng.integers(1, 32000, size=tokens).tolist(), sp)
        while engine.has_unfinished_requests():
            engine.step()

    run(2)  # warm/compile
    import jax
    trace_dir = f"/tmp/vllm_tpu_prefill_trace_{tag}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    run(4, "m")
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    path = None
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith("perfetto_trace.json.gz"):
                path = os.path.join(root, f)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in names.items() if "TPU" in n}
    by_name = defaultdict(float)
    long_names = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        by_name[e["name"]] += e["dur"]
        if e["name"] not in long_names:
            long_names[e["name"]] = e.get("args", {}).get(
                "long_name", "")[:90]
    print(f"== {tag}: wall {wall:.2f}s for 4 prompts x {tokens} tok ==",
          flush=True)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {dur/1e3:8.2f} ms total  {name[:40]:40s} "
              f"{long_names.get(name, '')}", flush=True)
    del engine
    return wall


def main():
    tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    w_plain = profile_engine("plain", False, tokens)
    time.sleep(20)
    w_chunk = profile_engine("chunk", True, tokens)
    print(f"plain {w_plain:.2f}s vs chunked {w_chunk:.2f}s "
          f"({w_chunk / w_plain:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
