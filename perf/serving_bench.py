# SPDX-License-Identifier: Apache-2.0
"""Open-loop serving latency benchmark: Poisson arrivals into the engine
loop, per-request TTFT / TPOT percentiles.

bench.py measures a closed batch (all prompts at t=0), which cannot see
arrival-driven latency effects — decode windows gating admissions, the
adaptive window policy (config.decode_window_when_waiting), async-decode
misprediction costs. This drives the same EngineCore the API server's
engine thread runs, with requests injected at Poisson times.

    python perf/serving_bench.py [rate_req_s ...]      (default 6 9 12)

Env: SERVE_SECS (default 60 simulated-arrival seconds), SERVE_GEN (128),
SERVE_WAITWIN (decode_window_when_waiting; 0 = disable shortening),
plus all BENCH_* knobs (model/quant/batch) from bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import bench
from vllm_neuron_tpu.sampling.params import SamplingParams


def pct(xs, p):
    if not xs:
        return float("nan")
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * len(xs)))]


def run_rate(engine, rate: float, secs: float, gen: int, seed: int):
    rng = np.random.default_rng(seed)
    n = max(1, int(rate * secs))
    arrivals = np.cumsum(rng.exponential(1.0 / rate, size=n))
    vocab = min(32000, engine.config.model.hf_config.vocab_size)
    prompts = [rng.integers(1, vocab, size=bench.PROMPT_LEN).tolist()
               for _ in range(n)]
    sp = SamplingParams(temperature=0.0, max_tokens=gen, ignore_eos=True,
                        detokenize=False)
    t0 = time.perf_counter()
    submitted = 0
    arrival_t = {}
    first_t = {}
    finish_t = {}
    ntok = {}
    while submitted < n or engine.has_unfinished_requests():
        now = time.perf_counter() - t0
        while submitted < n and arrivals[submitted] <= now:
            rid = f"s{seed}-{submitted}"
            engine.add_request(rid, prompts[submitted], sp)
            arrival_t[rid] = arrivals[submitted]
            submitted += 1
        if not engine.has_unfinished_requests():
            # Idle until the next arrival.
            time.sleep(max(0.0, arrivals[submitted] -
                           (time.perf_counter() - t0)))
            continue
        outs = engine.step()
        now = time.perf_counter() - t0
        for o in outs:
            rid = o.request_id
            if rid not in first_t and o.outputs[0].token_ids:
                first_t[rid] = now
            if o.finished:
                finish_t[rid] = now
                ntok[rid] = len(o.outputs[0].token_ids)
    ttft = [first_t[r] - arrival_t[r] for r in first_t]
    tpot = [(finish_t[r] - first_t[r]) / max(ntok[r] - 1, 1)
            for r in finish_t]
    wall = time.perf_counter() - t0
    return {
        "rate_req_s": rate,
        "n": n,
        "throughput_tok_s": sum(ntok.values()) / wall,
        "ttft_p50_ms": round(1e3 * pct(ttft, 0.50), 1),
        "ttft_p99_ms": round(1e3 * pct(ttft, 0.99), 1),
        "tpot_p50_ms": round(1e3 * pct(tpot, 0.50), 1),
        "tpot_p99_ms": round(1e3 * pct(tpot, 0.99), 1),
    }


def main():
    if os.environ.get("BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    rates = [float(a) for a in sys.argv[1:]] or [6.0, 9.0, 12.0]
    secs = float(os.environ.get("SERVE_SECS", "60"))
    gen = int(os.environ.get("SERVE_GEN", "128"))
    engine = bench.build_engine()
    waitwin = int(os.environ.get("SERVE_WAITWIN", "-1"))
    if waitwin >= 0:
        engine.config.scheduler.decode_window_when_waiting = \
            waitwin or engine.config.scheduler.decode_window
    # Warm: compile prefill + decode programs.
    bench.run_workload(engine, 2, 16, "warm")
    import json
    for i, rate in enumerate(rates):
        r = run_rate(engine, rate, secs, gen, seed=i)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
