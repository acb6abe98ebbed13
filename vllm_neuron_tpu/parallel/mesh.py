# SPDX-License-Identifier: Apache-2.0
"""Device-mesh construction.

The data plane is compiler-emitted XLA collectives over ICI (the TPU analogue
of the reference's NeuronLink collectives compiled into the NEFF by
neuronx-cc; SURVEY.md §2.5). Axis names:
  - "data":   replica axis (DP)
  - "expert": expert-parallel axis (EP; MoE expert dim — reference analogue:
    NxDI blockwise MoE block_parallel, test/e2e/offline/test_offline_e2e.py:58-69)
  - "model":  tensor-parallel axis (TP; attention heads / MLP width / vocab)
Sequence parallelism reuses the "model" axis for activation sharding.
The expert axis is innermost-but-one so expert psums ride ICI next to TP.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from vllm_neuron_tpu.config import ParallelConfig
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

DATA_AXIS = "data"
EXPERT_AXIS = "expert"
MODEL_AXIS = "model"


def build_mesh(parallel_config: ParallelConfig,
               devices: Optional[list] = None) -> Mesh:
    tp = parallel_config.tensor_parallel_size
    dp = parallel_config.data_parallel_size
    ep = parallel_config.expert_parallel_size
    devices = devices or parallel_config.devices or jax.devices()
    need = tp * dp * ep
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for dp={dp} x ep={ep} x tp={tp}, have "
            f"{len(devices)}")
    devs = np.asarray(devices[:need]).reshape(dp, ep, tp)
    logger.info("mesh: %d devices as (data=%d, expert=%d, model=%d)",
                need, dp, ep, tp)
    return Mesh(devs, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap over DCN (reference analogue: the thin gloo
    world-size-1 init, neuron_worker.py:106-121 — here it actually wires up
    multiple hosts; collectives still ride ICI inside the compiled program).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
