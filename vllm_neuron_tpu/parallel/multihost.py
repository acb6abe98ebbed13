# SPDX-License-Identifier: Apache-2.0
"""Multi-host serving scaffolding (pod slices).

Design (SURVEY.md §2.5 / §7.2 M8): the TPU analogue of the reference's
"driver worker returns output, others return None" contract
(vllm_neuron/worker/neuron_worker.py:68-69) — every host must enter the SAME
jit-compiled program each step, so the leader host (process 0) runs the API
frontend + scheduler and broadcasts each step's device-input bundle over DCN;
followers run a lockstep loop that replays the leader's steps. Collectives
inside the program ride ICI within each host and DCN across hosts, exactly
as the mesh is laid out.

The broadcast path uses jax's multihost utils (which piggyback on the
already-initialized distributed runtime), so no extra service is needed.
Single-host behavior is unchanged: every helper is a no-op passthrough when
process_count() == 1.
"""
from __future__ import annotations

import pickle
from typing import Any, Optional

import jax
import numpy as np

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

_MAX_STEP_BYTES = 64 * 1024 * 1024


def is_leader() -> bool:
    return jax.process_index() == 0


def num_hosts() -> int:
    return jax.process_count()


def broadcast_step(payload: Optional[Any]) -> Any:
    """Broadcast one step's host-side input bundle (numpy arrays + python
    scalars) from the leader to all hosts. Leader passes the payload;
    followers pass None and receive the leader's. No-op on single host."""
    if num_hosts() == 1:
        return payload
    from jax.experimental import multihost_utils

    if is_leader():
        raw = pickle.dumps(payload)
        if len(raw) > _MAX_STEP_BYTES:
            raise ValueError(f"step payload too large: {len(raw)} bytes")
        buf = np.zeros(_MAX_STEP_BYTES + 8, np.uint8)
        buf[:8] = np.frombuffer(
            len(raw).to_bytes(8, "little"), np.uint8)
        buf[8:8 + len(raw)] = np.frombuffer(raw, np.uint8)
    else:
        buf = np.zeros(_MAX_STEP_BYTES + 8, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    size = int.from_bytes(bytes(buf[:8]), "little")
    return pickle.loads(bytes(buf[8:8 + size]))


def sync_hosts(tag: str = "") -> None:
    """Barrier across hosts (checkpoint boundaries, shutdown)."""
    if num_hosts() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag or "vllm_neuron_tpu")


class FollowerLoop:
    """Follower-host engine loop: replays the leader's step bundles against
    the local shard of the sharded programs. The leader drives scheduling;
    followers only execute (their outputs are discarded — logits/token
    shards are fully replicated at the program boundary)."""

    def __init__(self, worker):
        self.worker = worker

    def run_forever(self) -> None:
        assert not is_leader(), "leader runs the engine, not the follower loop"
        logger.info("follower %d entering lockstep loop", jax.process_index())
        while True:
            bundle = broadcast_step(None)
            if bundle is None or bundle.get("op") == "shutdown":
                logger.info("follower received shutdown")
                return
            method = getattr(self.worker.model_runner.executor,
                             bundle["op"])
            method(**bundle["kwargs"])
