# SPDX-License-Identifier: Apache-2.0
"""Shared on-chip timing harness for the perf/ microbenches.

The axon tunnel adds two costs that swamp naive measurements:
  - ~0.8-1.7 ms of host dispatch per jitted call (overlaps device work
    when calls are enqueued back-to-back);
  - ~20-55 ms for the ONE host<->device round trip that fetches a result.

So: wrap the op in an in-program lax.scan (SCAN calls per dispatch),
enqueue DISPATCHES programs back-to-back, fetch one scalar at the end,
and report (elapsed - rtt) / (DISPATCHES * SCAN). The RTT is measured on
the spot by timing scalar fetches of an already-computed array. A
throwaway burst absorbs the first-timed-loop transient (observed reading
10-100x high).

Per CLAUDE.md: microbenches are only valid run serially in a fresh
process on the single-tenant chip.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def measure_rtt(n: int = 5) -> float:
    """Median seconds for one ready-array scalar fetch (tunnel RTT)."""
    x = jnp.zeros((8, 128), jnp.float32)
    x.block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(x[0, 0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_op(fn, x0, *, scan: int = 64, dispatches: int = 8,
            rtt: float | None = None) -> float:
    """Seconds per fn call, RTT-corrected.

    ``fn`` must map x -> x (same shape/dtype) so calls chain inside one
    in-program scan; feed a reduced output back into the input to create
    the dependency if the op is not naturally chainable.
    """
    if rtt is None:
        rtt = measure_rtt()

    def step(x, _):
        return fn(x), None

    run = jax.jit(lambda x: jax.lax.scan(step, x, None, length=scan)[0])
    x = run(x0)
    x.block_until_ready()  # compile
    for _ in range(2):     # throwaway burst (first timed loop reads high)
        x = run(x)
    _ = float(jnp.asarray(x).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(dispatches):
        x = run(x)
    _ = float(jnp.asarray(x).reshape(-1)[0])
    elapsed = time.perf_counter() - t0
    return max(elapsed - rtt, 0.0) / (dispatches * scan)
