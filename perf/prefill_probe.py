# SPDX-License-Identifier: Apache-2.0
"""TTFT decomposition: wall time of each engine.step() through the prefill
phase of the bench workload (run ALONE on the TPU).

The scheduler admits max_prompt_batch_size prompts per prefill step; each
step dispatches M prefill programs back-to-back and pays ONE device_get
sync. This prints where the p50 TTFT actually goes: host prep vs device
time vs the per-step sync.

    python perf/prefill_probe.py [n_requests] [max_prompt_batch_size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    if len(sys.argv) > 2:
        mpb = int(sys.argv[2])
    else:
        mpb = None

    engine = bench.build_engine()
    if mpb is not None:
        engine.scheduler.max_prompt_batch_size = mpb
    from vllm_neuron_tpu.sampling.params import SamplingParams

    rng = np.random.default_rng(0)
    # PROBE_GEN: match bench.py's max_tokens (128) to replicate its TTFT
    # accounting exactly; default 4 keeps the probe fast.
    gen = int(os.environ.get("PROBE_GEN", "4"))
    sp = SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True,
                        detokenize=False)
    # Warmup: compile prefill + decode programs (same shape as bench.py).
    for w in range(2):
        engine.add_request(f"warm-{w}",
                           rng.integers(1, 32000, size=512).tolist(),
                           SamplingParams(temperature=0.0, max_tokens=16,
                                          ignore_eos=True, detokenize=False))
    while engine.has_unfinished_requests():
        engine.step()

    for r in range(n):
        engine.add_request(f"r{r}", rng.integers(1, 32000, size=512).tolist(),
                           sp)
    t0 = time.perf_counter()
    first_seen = 0
    print(f"mpb={engine.scheduler.max_prompt_batch_size} n={n}")
    while engine.has_unfinished_requests():
        s0 = time.perf_counter()
        outs = engine.step()
        s1 = time.perf_counter()
        newly = sum(1 for o in outs if o.outputs[0].token_ids and
                    len(o.outputs[0].token_ids) <= 4)
        kind = "prefill" if engine.scheduler.running and first_seen < n \
            else "decode"
        first_seen += sum(1 for o in outs
                          if len(o.outputs[0].token_ids) == 1)
        print(f"  step {kind}: {1e3*(s1-s0):8.2f} ms  (+{newly} emits, "
              f"t={1e3*(s1-t0):8.1f} ms)", flush=True)
        if first_seen >= n:
            break
    print(f"all first tokens at {1e3*(time.perf_counter()-t0):.1f} ms")


if __name__ == "__main__":
    main()
