# SPDX-License-Identifier: Apache-2.0
"""Data-parallel serving: ``dp`` independent engine lanes over disjoint
device slices.

TPU-native data parallelism for SERVING is request-level, not batch-level:
requests are independent, so the right decomposition is dp full engines
(scheduler + KV cache + executor), each owning tensor_parallel_size *
expert_parallel_size devices, with a least-loaded router in front. No
collectives cross lanes — weights are replicated per lane (the definition
of DP) and each lane's programs touch only its own devices, so lanes run
concurrently on the hardware while the host drives them from worker
threads (device steps release the GIL in transfers/waits).

This replaces round 1's mesh "data" axis, which replicated the batch over
the data dimension (identical work on every replica — parallelism without
throughput). Reference analogue: upstream vLLM's DP engine-core ranks; the
reference plugin itself pins world_size=1 per engine
(vllm_neuron/worker/neuron_worker.py:106-121) and scales the same way —
whole engines side by side.
"""
from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from vllm_neuron_tpu.config import EngineConfig, ParallelConfig
from vllm_neuron_tpu.engine.core import EngineCore, Histogram, StepMetrics
from vllm_neuron_tpu.engine.outputs import RequestOutput
from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class AggregateMetrics:
    """Read-only merge of the lanes' StepMetrics (same snapshot/prometheus
    surface as a single core's metrics)."""

    def __init__(self, parts: list[StepMetrics]):
        self._parts = parts

    def snapshot(self) -> dict:
        snaps = [p.snapshot() for p in self._parts]
        out: dict = {}
        for key in snaps[0]:
            vals = [s[key] for s in snaps]
            if key.endswith(("_p50_s", "_p99_s")):
                got = [v for v in vals if v is not None]
                out[key] = max(got) if got else None  # conservative tail
            elif key == "kv_cache_usage":
                out[key] = sum(vals) / len(vals)
            elif key == "spec_decode_acceptance_rate":
                pass  # recomputed from the summed counters below
            else:
                out[key] = sum(vals)
        drafted = out.get("spec_decode_draft_tokens", 0)
        out["spec_decode_acceptance_rate"] = (
            out.get("spec_decode_accepted_tokens", 0) / drafted
            if drafted else None)
        return out

    def prometheus(self, prefix: str = "vllm_tpu") -> str:
        merged = StepMetrics()
        first = self._parts[0]
        merged.start_time = min(p.start_time for p in self._parts)
        for name in ("num_steps", "num_prefill_steps", "num_decode_steps",
                     "prompt_tokens", "generation_tokens",
                     "requests_started", "requests_finished",
                     "num_preemptions", "queue_depth", "running_seqs"):
            setattr(merged, name, sum(getattr(p, name) for p in self._parts))
        merged.kv_usage = sum(p.kv_usage for p in self._parts) / len(
            self._parts)
        for attr in ("ttft", "tpot"):
            hist = Histogram(getattr(first, attr).bounds)
            for p in self._parts:
                src = getattr(p, attr)
                for i, c in enumerate(src.counts):
                    hist.counts[i] += c
                hist.overflow += src.overflow
                hist.total += src.total
                hist.sum += src.sum
            setattr(merged, attr, hist)
        return merged.prometheus(prefix)


class DPEngine:
    """EngineCore-compatible facade over ``data_parallel_size`` lanes."""

    def __init__(self, config: EngineConfig, tokenizer=None):
        import jax
        par = config.parallel
        dp = par.data_parallel_size
        assert dp > 1, "DPEngine requires data_parallel_size > 1"
        per_lane = par.tensor_parallel_size * par.expert_parallel_size
        devices = list(par.devices or jax.devices())
        if len(devices) < dp * per_lane:
            raise ValueError(
                f"data_parallel_size={dp} x (tp*ep)={per_lane} needs "
                f"{dp * per_lane} devices, have {len(devices)}")
        self.config = config
        self.cores: list[EngineCore] = []
        for r in range(dp):
            lane_par = ParallelConfig(
                tensor_parallel_size=par.tensor_parallel_size,
                data_parallel_size=1,
                sequence_parallel=par.sequence_parallel,
                expert_parallel_size=par.expert_parallel_size,
                devices=devices[r * per_lane:(r + 1) * per_lane])
            lane_cfg = dataclasses.replace(config, parallel=lane_par)
            logger.info("DP lane %d/%d on devices %s", r + 1, dp,
                        lane_par.devices)
            self.cores.append(EngineCore(lane_cfg, tokenizer=tokenizer))
        self._lane_of: dict[str, int] = {}
        self._pool = ThreadPoolExecutor(max_workers=dp,
                                        thread_name_prefix="dp-lane")
        self.metrics = AggregateMetrics([c.metrics for c in self.cores])

    def warmup(self) -> None:
        for core in self.cores:
            core.warmup()

    # ------------------------------------------------------------------

    def _pick_lane(self, parent_req_id: Optional[str]) -> int:
        # n>1 siblings join their parent's lane: prompt blocks are shared
        # through that lane's prefix cache / shared-prefill path.
        if parent_req_id is not None and parent_req_id in self._lane_of:
            return self._lane_of[parent_req_id]
        loads = [len(c.scheduler.waiting) + len(c.scheduler.running)
                 for c in self.cores]
        return loads.index(min(loads))

    def add_request(self, req_id: str, prompt_token_ids: list[int],
                    sampling_params: SamplingParams,
                    prompt: Optional[str] = None, mm_inputs=None,
                    lora_request=None,
                    parent_req_id: Optional[str] = None) -> None:
        lane = self._pick_lane(parent_req_id)
        # Map only after the lane accepted the request — a validation
        # error must not leak a lane entry.
        self.cores[lane].add_request(
            req_id, prompt_token_ids, sampling_params, prompt=prompt,
            mm_inputs=mm_inputs, lora_request=lora_request,
            parent_req_id=parent_req_id)
        self._lane_of[req_id] = lane

    def abort_request(self, req_id: str) -> None:
        # Aborted requests never re-emerge through step()'s finished
        # outputs (they stop being scheduled), so drop the mapping here.
        lane = self._lane_of.pop(req_id, None)
        if lane is not None:
            self.cores[lane].abort_request(req_id)

    def has_unfinished_requests(self) -> bool:
        return any(c.has_unfinished_requests() for c in self.cores)

    def step(self) -> list[RequestOutput]:
        """Step every lane with work CONCURRENTLY (lanes block on their own
        device fetches; disjoint devices execute in parallel)."""
        busy = [c for c in self.cores if c.has_unfinished_requests()]
        if not busy:
            return []
        if len(busy) == 1:
            outs = [busy[0].step()]
        else:
            outs = list(self._pool.map(lambda c: c.step(), busy))
        merged: list[RequestOutput] = []
        for lane_outs in outs:
            merged.extend(lane_outs)
        for out in merged:
            if out.finished:
                self._lane_of.pop(out.request_id, None)
        return merged


def make_engine(config: EngineConfig, tokenizer=None):
    """EngineCore for dp==1, DPEngine lanes otherwise."""
    if config.parallel.data_parallel_size > 1:
        return DPEngine(config, tokenizer=tokenizer)
    return EngineCore(config, tokenizer=tokenizer)
