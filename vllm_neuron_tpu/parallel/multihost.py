# SPDX-License-Identifier: Apache-2.0
"""Multi-host serving: leader/follower lockstep execution (pod slices).

Design (SURVEY.md §2.5 / §7.2 M8): the TPU analogue of the reference's
"driver worker returns output, others return None" contract
(vllm_neuron/worker/neuron_worker.py:68-69) — every host must enter the SAME
jit-compiled SPMD program each step, so the leader host (process 0) runs the
API frontend + scheduler and broadcasts each step's dispatch bundle
(executor method name + host-side numpy args) over DCN; followers run a
lockstep loop replaying those dispatches against their local device shards.
Collectives inside the program ride ICI within each host and DCN across
hosts, exactly as the mesh is laid out.

Wiring (all call sites, no dead code):
  - ModelExecutor._replicate() broadcasts every program dispatch when
    multi-host serving is active (worker/executor.py).
  - FollowerLoop replays bundles; api_server routes non-leader hosts into
    it and the leader broadcasts a shutdown bundle on exit
    (server/api_server.py).
  - Device-resident carries (a decode window chained off the previous
    window's on-device tokens) cross hosts as the CARRY_LAST sentinel: each
    host substitutes its OWN device array — the SPMD programs are
    identical, so the local shard holds the same logical value.

The broadcast uses jax's multihost utils over the already-initialized
distributed runtime. Payloads are size-bucketed (two small collectives per
step) — fine for control-plane traffic; bulk data never crosses DCN here.
Single-host behavior: every helper is a no-op passthrough.
"""
from __future__ import annotations

import pickle
from typing import Any, Optional

import jax
import numpy as np

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

# Sentinel for "use your own device-resident last-window tokens" (pickled
# by name, so it must be a stable string).
CARRY_LAST = "__carry_last_tokens__"

_MAX_STEP_BYTES = 64 * 1024 * 1024
_MIN_BUCKET = 4096


def is_leader() -> bool:
    return jax.process_index() == 0


def num_hosts() -> int:
    return jax.process_count()


def _bucket(size: int) -> int:
    b = _MIN_BUCKET
    while b < size:
        b *= 4
    return b


def broadcast_step(payload: Optional[Any]) -> Any:
    """Broadcast one dispatch bundle (numpy arrays + python scalars) from
    the leader to all hosts. Leader passes the payload; followers pass None
    and receive the leader's. No-op on a single host."""
    if num_hosts() == 1:
        return payload
    from jax.experimental import multihost_utils

    if is_leader():
        raw = pickle.dumps(payload)
        if len(raw) > _MAX_STEP_BYTES:
            raise ValueError(f"step payload too large: {len(raw)} bytes")
        hdr = np.asarray([len(raw)], np.int64)
    else:
        raw = b""
        hdr = np.zeros(1, np.int64)
    hdr = multihost_utils.broadcast_one_to_all(hdr)
    size = int(hdr[0])
    buf = np.zeros(_bucket(size), np.uint8)
    if is_leader():
        buf[:size] = np.frombuffer(raw, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(bytes(buf[:size]))


def sync_hosts(tag: str = "") -> None:
    """Barrier across hosts (checkpoint boundaries, shutdown)."""
    if num_hosts() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag or "vllm_neuron_tpu")


class FollowerLoop:
    """Follower-host engine loop: replays the leader's dispatch bundles
    against the local shards of the SPMD programs. The leader drives
    scheduling; follower outputs are discarded (token/logit results are
    replicated at the program boundary, so the leader's copy is
    authoritative)."""

    def __init__(self, worker):
        self.executor = worker.model_runner.executor

    def step(self, bundle: Optional[dict]) -> bool:
        """Replay one bundle; returns False when the loop should exit."""
        if bundle is None or bundle.get("op") == "shutdown":
            return False
        kwargs = dict(bundle["kwargs"])
        for k, v in kwargs.items():
            if isinstance(v, str) and v == CARRY_LAST:
                kwargs[k] = self.executor.carry_last
        getattr(self.executor, bundle["op"])(**kwargs)
        return True

    def run_forever(self) -> None:
        assert not is_leader(), \
            "leader runs the engine, not the follower loop"
        logger.info("follower %d entering lockstep loop",
                    jax.process_index())
        while self.step(broadcast_step(None)):
            pass
        logger.info("follower %d shutting down", jax.process_index())


def broadcast_shutdown() -> None:
    """Leader-side: release followers from the lockstep loop."""
    if num_hosts() > 1 and is_leader():
        broadcast_step({"op": "shutdown"})
