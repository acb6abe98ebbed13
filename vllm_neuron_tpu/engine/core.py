# SPDX-License-Identifier: Apache-2.0
"""EngineCore: the schedule -> execute -> update loop, plus output
processing (detokenization, stop strings, RequestOutput assembly).

TPU-native rebuild of the vLLM V1 EngineCore capability the reference relies
on (SURVEY.md §2.2 V3; hot loop documented in SURVEY.md §3.2)."""
from __future__ import annotations

import itertools
import time
from typing import Optional, Union

from vllm_neuron_tpu.config import EngineConfig
from vllm_neuron_tpu.core.scheduler import EngineCoreOutput, Scheduler
from vllm_neuron_tpu.engine.detokenizer import IncrementalDetokenizer
from vllm_neuron_tpu.engine.outputs import CompletionOutput, RequestOutput
from vllm_neuron_tpu.engine.request import Request
from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.utils import init_logger
from vllm_neuron_tpu.worker.worker import Worker

logger = init_logger(__name__)


class StepMetrics:
    """Engine counters + latency histograms (the serving-metrics surface the
    reference delegates to upstream vLLM; SURVEY.md §5 observability)."""

    # Histogram bucket bounds in seconds.
    TTFT_BUCKETS = (0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
                    30.0)
    TPOT_BUCKETS = (0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0)

    def __init__(self):
        self.num_steps = 0
        self.num_prefill_steps = 0
        self.num_decode_steps = 0
        self.prompt_tokens = 0
        self.generation_tokens = 0
        self.requests_started = 0
        self.requests_finished = 0
        self.num_preemptions = 0
        self.start_time = time.monotonic()
        self.ttft = Histogram(self.TTFT_BUCKETS)
        self.tpot = Histogram(self.TPOT_BUCKETS)
        # Live gauges, refreshed each step.
        self.queue_depth = 0
        self.running_seqs = 0
        self.kv_usage = 0.0
        # Speculative decoding acceptance (refreshed from the runner).
        self.spec_rounds = 0
        self.spec_drafted = 0
        self.spec_accepted = 0

    def snapshot(self) -> dict:
        elapsed = max(time.monotonic() - self.start_time, 1e-9)
        return {
            "steps": self.num_steps,
            "prefill_steps": self.num_prefill_steps,
            "decode_steps": self.num_decode_steps,
            "prompt_tokens": self.prompt_tokens,
            "generation_tokens": self.generation_tokens,
            "generation_tokens_per_s": self.generation_tokens / elapsed,
            "requests_started": self.requests_started,
            "requests_finished": self.requests_finished,
            "num_preemptions": self.num_preemptions,
            "queue_depth": self.queue_depth,
            "running_seqs": self.running_seqs,
            "kv_cache_usage": self.kv_usage,
            "spec_decode_rounds": self.spec_rounds,
            "spec_decode_draft_tokens": self.spec_drafted,
            "spec_decode_accepted_tokens": self.spec_accepted,
            "spec_decode_acceptance_rate":
                (self.spec_accepted / self.spec_drafted
                 if self.spec_drafted else None),
            "ttft_p50_s": self.ttft.percentile(0.5),
            "ttft_p99_s": self.ttft.percentile(0.99),
            "tpot_p50_s": self.tpot.percentile(0.5),
            "tpot_p99_s": self.tpot.percentile(0.99),
        }

    def prometheus(self, prefix: str = "vllm_tpu") -> str:
        lines = []
        for k, v in self.snapshot().items():
            if v is None:
                continue
            lines.append(f"{prefix}_{k} {v}")
        for name, hist in (("ttft", self.ttft), ("tpot", self.tpot)):
            acc = 0
            for bound, count in zip(hist.bounds, hist.counts):
                acc += count
                lines.append(
                    f'{prefix}_{name}_seconds_bucket{{le="{bound}"}} {acc}')
            lines.append(
                f'{prefix}_{name}_seconds_bucket{{le="+Inf"}} {hist.total}')
            lines.append(f"{prefix}_{name}_seconds_count {hist.total}")
            lines.append(f"{prefix}_{name}_seconds_sum {hist.sum:.6f}")
        return "\n".join(lines) + "\n"


class Histogram:
    __slots__ = ("bounds", "counts", "overflow", "total", "sum")

    def __init__(self, bounds):
        self.bounds = bounds
        self.counts = [0] * len(bounds)
        self.overflow = 0
        self.total = 0
        self.sum = 0.0

    def observe(self, value: float) -> None:
        self.total += 1
        self.sum += value
        for i, b in enumerate(self.bounds):
            if value <= b:
                self.counts[i] += 1
                return
        self.overflow += 1

    def percentile(self, q: float):
        if self.total == 0:
            return None
        target = q * self.total
        acc = 0
        for bound, count in zip(self.bounds, self.counts):
            acc += count
            if acc >= target:
                return bound
        return self.bounds[-1]


class RequestState:
    """Engine-side per-request output accumulation."""

    def __init__(self, request: Request, prompt: Optional[str],
                 detokenizer: Optional[IncrementalDetokenizer]):
        self.request = request
        self.prompt = prompt
        self.detokenizer = detokenizer
        self.token_ids: list[int] = []
        self.logprobs: list[dict[int, float]] = []
        self.finish_reason: Optional[str] = None
        self.stop_reason = None
        self.cumulative_logprob: Optional[float] = None


class EngineCore:

    def __init__(self, config: EngineConfig, tokenizer=None):
        self.config = config
        self.tokenizer = tokenizer
        # Fail (or downshift the pool) BEFORE the scheduler's block pool
        # and the device allocation exist — near-ceiling configs used to
        # wedge the chip at first dispatch instead (VERDICT r4 #6).
        from vllm_neuron_tpu.utils.membudget import apply_memory_budget
        apply_memory_budget(config)
        self.scheduler = Scheduler(config)
        self.worker = Worker(config)
        self.worker.init_device()
        self.worker.load_model()
        self.req_states: dict[str, RequestState] = {}
        self.metrics = StepMetrics()
        self._eos_token_id = self._resolve_eos()

    def warmup(self) -> None:
        """Pre-compile every program variant reachable from this config
        (reference analogue: NxDI warmup unless skip_warmup). Optional:
        without it programs compile lazily on first use and load from the
        persistent cache on every later run of the same config."""
        self.worker.compile_or_warm_up_model()

    def _resolve_eos(self) -> Optional[int]:
        if self.tokenizer is not None and \
                getattr(self.tokenizer, "eos_token_id", None) is not None:
            return self.tokenizer.eos_token_id
        eos = getattr(self.config.model.hf_config, "eos_token_id", None)
        if isinstance(eos, list):
            eos = eos[0] if eos else None
        return eos

    # ------------------------------------------------------------------

    def add_request(self, req_id: str, prompt_token_ids: list[int],
                    sampling_params: SamplingParams,
                    prompt: Optional[str] = None, mm_inputs=None,
                    lora_request=None,
                    parent_req_id: Optional[str] = None) -> None:
        request = Request(req_id, prompt_token_ids, sampling_params,
                          eos_token_id=self._eos_token_id,
                          mm_inputs=mm_inputs,
                          lora_int_id=self.config.lora.resolve(lora_request),
                          parent_req_id=parent_req_id)
        self.metrics.requests_started += 1
        detok = None
        if self.tokenizer is not None and sampling_params.detokenize:
            detok = IncrementalDetokenizer(self.tokenizer, sampling_params,
                                           prompt_token_ids)
        self.req_states[req_id] = RequestState(request, prompt, detok)
        self.scheduler.add_request(request)

    def abort_request(self, req_id: str) -> None:
        self.scheduler.abort_request(req_id)

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_requests()

    # ------------------------------------------------------------------

    def step(self) -> list[RequestOutput]:
        """One engine iteration; returns deltas for requests that progressed."""
        scheduler_output = self.scheduler.schedule()
        runner_output = self.worker.execute_model(scheduler_output)
        core_outputs = self.scheduler.update_from_output(
            scheduler_output, runner_output)
        m = self.metrics
        m.num_steps += 1
        if scheduler_output.is_prefill_step:
            m.num_prefill_steps += 1
            m.prompt_tokens += scheduler_output.total_num_scheduled_tokens
        elif scheduler_output.num_scheduled_tokens:
            m.num_decode_steps += 1
        m.queue_depth = len(self.scheduler.waiting)
        m.running_seqs = len(self.scheduler.running)
        m.kv_usage = self.scheduler.kv_manager.usage()
        m.num_preemptions = self.scheduler._num_preemptions
        spec = getattr(self.worker.model_runner, "spec_stats", None)
        if spec is not None and spec["rounds"]:
            m.spec_rounds = spec["rounds"]
            m.spec_drafted = spec["drafted"]
            m.spec_accepted = spec["accepted"]
        return [self._process_output(o) for o in core_outputs]

    def _process_output(self, out: EngineCoreOutput) -> RequestOutput:
        state = self.req_states[out.req_id]
        state.token_ids.extend(out.new_token_ids)
        self.metrics.generation_tokens += len(out.new_token_ids)
        now = time.monotonic()
        request = state.request
        if out.new_token_ids and request.first_token_time is None:
            request.first_token_time = now
            self.metrics.ttft.observe(now - request.arrival_time)
        if out.finished:
            self.metrics.requests_finished += 1
            request.finish_time = now
            n = len(state.token_ids)
            if n > 1 and request.first_token_time is not None:
                self.metrics.tpot.observe(
                    (now - request.first_token_time) / (n - 1))
        if out.logprobs is not None:
            for ids, lps in zip(out.logprobs.token_ids,
                                out.logprobs.logprobs):
                state.logprobs.append(dict(zip(ids, lps)))
        text_delta = ""
        if state.detokenizer is not None:
            text_delta = state.detokenizer.append(out.new_token_ids)
            stop_str = state.detokenizer.check_stop_strings()
            if stop_str is not None and not out.finished:
                # Token-level checks missed it; stop on the string match.
                self.scheduler.abort_request(out.req_id)
                state.finish_reason = "stop"
                state.stop_reason = stop_str
        if out.finished and state.finish_reason is None:
            state.finish_reason = out.finish_reason
            state.stop_reason = out.stop_reason
        return self._make_request_output(out.req_id, state)

    def _make_request_output(self, req_id: str,
                             state: RequestState) -> RequestOutput:
        text = (state.detokenizer.output_text
                if state.detokenizer is not None else "")
        completion = CompletionOutput(
            index=0,
            text=text,
            token_ids=list(state.token_ids),
            logprobs=state.logprobs if state.logprobs else None,
            finish_reason=state.finish_reason,
            stop_reason=state.stop_reason,
        )
        return RequestOutput(
            request_id=req_id,
            prompt=state.prompt,
            prompt_token_ids=state.request.prompt_token_ids,
            outputs=[completion],
            finished=state.finish_reason is not None,
        )
