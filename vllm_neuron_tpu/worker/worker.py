# SPDX-License-Identifier: Apache-2.0
"""TPU worker: device init, memory probe, KV spec, model execution dispatch.

TPU-native rebuild of the reference NeuronWorker
(vllm_neuron/worker/neuron_worker.py:21): same responsibilities, with
jax.distributed / device meshes in place of the gloo world-size-1 bootstrap
(:106-121) and jax device memory_stats in place of
torch.classes.neuron.Runtime (:51-63)."""
from __future__ import annotations

from typing import Optional

import jax

from vllm_neuron_tpu.config import EngineConfig
from vllm_neuron_tpu.core.sched_output import (ModelRunnerOutput,
                                               SchedulerOutput)
from vllm_neuron_tpu.utils import init_logger
from vllm_neuron_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)

# Conservative fallback when the device does not report memory stats
# (reference: 20 GiB fallback, neuron_worker.py:63).
_DEFAULT_AVAILABLE_BYTES = 20 * 2**30


class Worker:

    def __init__(self, config: EngineConfig):
        self.config = config
        self.mesh: Optional[jax.sharding.Mesh] = None
        self.model_runner: Optional[ModelRunner] = None
        self._profiling = False

    # ------------------------------------------------------------------

    def init_device(self) -> None:
        from vllm_neuron_tpu.parallel.mesh import build_mesh
        if (self.config.parallel.world_size > 1
                or self.config.parallel.devices is not None):
            # An explicit device list (a DP engine lane's slice) needs a
            # mesh even at world_size 1: NamedSharding over the 1-device
            # mesh is what pins this lane's params/KV to ITS device.
            self.mesh = build_mesh(self.config.parallel)
        self.model_runner = ModelRunner(self.config, mesh=self.mesh)

    def load_model(self, params: Optional[dict] = None) -> None:
        assert self.model_runner is not None, "call init_device first"
        self.model_runner.load_model(params)

    def compile_or_warm_up_model(self) -> None:
        self.model_runner.warmup()

    # ------------------------------------------------------------------

    def determine_available_memory(self) -> int:
        try:
            stats = jax.devices()[0].memory_stats()
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
            in_use = stats.get("bytes_in_use", 0)
            if limit:
                return int(limit - in_use)
        except Exception:
            pass
        logger.warning("device memory stats unavailable; assuming %d GiB",
                       _DEFAULT_AVAILABLE_BYTES >> 30)
        return _DEFAULT_AVAILABLE_BYTES

    def get_kv_cache_spec(self):
        return self.model_runner.executor.kv_spec

    def execute_model(self, so: SchedulerOutput) -> ModelRunnerOutput:
        return self.model_runner.execute_model(so)

    def check_health(self) -> bool:
        return True

    # -- LoRA. Adapters are registered at engine construction via
    # config.lora (lora_loader.py) and served per-request; the reference's
    # dynamic add/remove surface (vllm_neuron/worker/neuron_worker.py:123-138)
    # is not supported because adapter stacks are baked into the compiled
    # step programs. --

    def add_lora(self, lora_request) -> bool:
        raise NotImplementedError(
            "dynamic LoRA add is not supported: adapters are registered at "
            "engine construction (config.lora.adapters) and compiled into "
            "the step programs")

    def remove_lora(self, lora_id: int) -> bool:
        raise NotImplementedError(
            "dynamic LoRA remove is not supported: adapters are registered "
            "at engine construction (config.lora.adapters)")

    def pin_lora(self, lora_id: int) -> bool:
        raise NotImplementedError(
            "LoRA pinning is not applicable: all registered adapters stay "
            "resident in the compiled step programs")

    def list_loras(self) -> set:
        lora_cfg = getattr(self.config, "lora", None)
        if lora_cfg is None or not getattr(lora_cfg, "adapters", None):
            return set()
        return set(lora_cfg.adapters.keys())

    def profile(self, is_start: bool = True) -> None:
        """Real profiling, unlike the reference's NotImplementedError
        (neuron_worker.py:71-72): jax.profiler traces viewable in
        TensorBoard/Perfetto."""
        profile_dir = (self.config.observability.profile_dir
                       or "/tmp/vllm_neuron_tpu_profile")
        if is_start and not self._profiling:
            jax.profiler.start_trace(profile_dir)
            self._profiling = True
        elif not is_start and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
