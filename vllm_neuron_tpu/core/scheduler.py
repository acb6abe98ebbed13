# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching scheduler.

Behavioral rebuild of the reference policy
(vllm_neuron/core/scheduler.py:59-127 ContinuousBatchingNeuronScheduler):

- prefill-prioritized: if any waiting request can be admitted, the step is a
  context-encoding step and running decodes are held back — prefill and
  decode are never mixed in one device program (scheduler.py:93-103);
- at most ``max_prompt_batch_size`` (default 1, scheduler.py:116) new
  prompts per prefill step;
- admission requires space in the decode batch (scheduler.py:120-127);
- stop checking respects ``min_tokens`` (scheduler.py:130-166).

Owns block allocation directly (the reference delegates that to the vLLM V1
base scheduler; here the KVCacheManager is ours). Also implements chunked
prefill as a first-class scheduling mode (reference: upstream scheduler with
DISABLE_NEURON_CUSTOM_SCHEDULER=1, platform.py:146-147, README.md:116).
"""
from __future__ import annotations

from collections import deque
from typing import Optional

from vllm_neuron_tpu.config import EngineConfig
from vllm_neuron_tpu.core.kv_cache_manager import KVCacheManager
from vllm_neuron_tpu.core.sched_output import (CachedRequestData,
                                               ModelRunnerOutput,
                                               NewRequestData,
                                               SchedulerOutput)
from vllm_neuron_tpu.engine.request import (FINISH_REASON, Request,
                                            RequestStatus)
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class EngineCoreOutput:
    """Per-request result of one engine step."""

    __slots__ = ("req_id", "new_token_ids", "finished", "finish_reason",
                 "stop_reason", "logprobs")

    def __init__(self, req_id, new_token_ids, finished, finish_reason,
                 stop_reason, logprobs=None):
        self.req_id = req_id
        self.new_token_ids = new_token_ids
        self.finished = finished
        self.finish_reason = finish_reason
        self.stop_reason = stop_reason
        self.logprobs = logprobs


class Scheduler:

    def __init__(self, config: EngineConfig):
        self.config = config
        self.scheduler_config = config.scheduler
        self.max_model_len = config.model.max_model_len
        self.max_num_seqs = config.scheduler.max_num_seqs
        self.max_prompt_batch_size = config.scheduler.max_prompt_batch_size
        self.max_num_batched_tokens = config.scheduler.max_num_batched_tokens
        self.chunked_prefill = config.scheduler.enable_chunked_prefill
        self.chunk_size = config.scheduler.chunk_size
        self.block_size = config.cache.block_size
        # True while the last admission attempt failed on KV-block
        # allocation (cleared when blocks free or an admission succeeds);
        # gates the adaptive-window free-seat heuristic.
        self._kv_starved = False

        self.kv_manager = KVCacheManager(
            num_blocks=config.cache.num_blocks,
            block_size=config.cache.block_size,
            enable_prefix_caching=config.cache.enable_prefix_caching,
        )

        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        self.requests: dict[str, Request] = {}
        # Finished since the last schedule() call; reported to the worker in
        # the next SchedulerOutput so it can free per-request state.
        self._finished_to_report: set[str] = set()
        # Requests whose prefill has been scheduled but is not complete yet
        # (chunked prefill).
        self._num_preemptions = 0

    # ------------------------------------------------------------------
    # Request lifecycle
    # ------------------------------------------------------------------

    def add_request(self, request: Request) -> None:
        if request.num_prompt_tokens >= self.max_model_len:
            raise ValueError(
                f"prompt of {request.num_prompt_tokens} tokens does not fit "
                f"max_model_len={self.max_model_len}")
        if request.num_prompt_tokens > self.max_num_batched_tokens and \
                not self.chunked_prefill:
            raise ValueError(
                f"prompt of {request.num_prompt_tokens} tokens exceeds "
                f"max_num_batched_tokens={self.max_num_batched_tokens}")
        self.requests[request.req_id] = request
        self.waiting.append(request)

    def abort_request(self, req_id: str) -> None:
        request = self.requests.get(req_id)
        if request is None or request.is_finished:
            return
        request.status = RequestStatus.FINISHED_ABORTED
        if request in self.running:
            self.running.remove(request)
        else:
            try:
                self.waiting.remove(request)
            except ValueError:
                pass
        self._finish(request)

    def _finish(self, request: Request) -> None:
        # Freed blocks may unblock a KV-starved admission (see
        # _admission_imminent).
        self._kv_starved = False
        self.kv_manager.free(request)
        self._finished_to_report.add(request.req_id)
        # Drop the engine-lifetime reference (a long-running server would
        # otherwise retain every Request object ever served).
        self.requests.pop(request.req_id, None)

    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def num_unfinished(self) -> int:
        return len(self.waiting) + len(self.running)

    # ------------------------------------------------------------------
    # Scheduling
    # ------------------------------------------------------------------

    def schedule(self) -> SchedulerOutput:
        out = SchedulerOutput()
        out.finished_req_ids = self._finished_to_report
        self._finished_to_report = set()

        if self.chunked_prefill:
            self._schedule_chunked(out)
        else:
            scheduled_prefill = self._schedule_prefills(out)
            if not scheduled_prefill:
                self._schedule_decodes(out)
        out.total_num_scheduled_tokens = sum(
            out.num_scheduled_tokens.values())
        return out

    # -- prefill-prioritized continuous batching -----------------------

    def _can_admit(self, num_running_before: int, num_admitted: int) -> bool:
        """Reference can_schedule (core/scheduler.py:115-127): space in both
        the decode batch and the prefill batch. ``num_running_before`` is the
        running count at step start (self.running grows during admission).

        Cold-start burst (TTFT p50 lever, VERDICT-r3 #7): when NOTHING is
        decoding, a large admission batch starves no one, and p50 TTFT over
        a closed batch is ceil(B/2m) * (m*d + RTT) — monotonically better in
        the admission size m (fewer per-step RTTs ahead of the median
        prompt). So the per-step cap rises to half the seq budget; with
        decodes running the normal cap bounds the decode stall."""
        total = num_running_before + num_admitted
        start_new_batch = total == 0
        cap = self.max_prompt_batch_size
        if num_running_before == 0:
            cap = max(cap, self.max_num_seqs // 2)
        cond1 = total < self.max_num_seqs
        cond2 = num_admitted < cap
        return start_new_batch or (cond1 and cond2)

    def _schedule_prefills(self, out: SchedulerOutput) -> bool:
        num_admitted = 0
        num_running_before = len(self.running)
        while self.waiting and self._can_admit(num_running_before,
                                               num_admitted):
            request = self.waiting[0]
            computed_blocks, num_cached = \
                self.kv_manager.get_computed_blocks(request) \
                if request.num_computed_tokens == 0 else ([], 0)
            # n>1 sibling sharing: adopt the parent's full prompt blocks
            # (byte-identical KV, same prompt) when that beats the prefix
            # cache; if the parent hasn't prefilled yet, defer the child a
            # step rather than re-prefill the whole prompt (reference gap:
            # vLLM fans n out as independent requests too — this exceeds it).
            parent = (self.requests.get(request.parent_req_id)
                      if request.parent_req_id else None)
            if parent is not None and request.num_computed_tokens == 0:
                sib_blocks, sib_tokens = \
                    self.kv_manager.get_sibling_blocks(request, parent)
                if sib_tokens > num_cached:
                    computed_blocks, num_cached = sib_blocks, sib_tokens
                elif (num_cached == 0 and not parent.is_finished
                      and parent.num_computed_tokens
                      < parent.num_prompt_tokens
                      and request.num_prompt_tokens - 1
                      >= self.kv_manager.block_size):
                    break
            # num_tokens (not num_prompt_tokens): a resumed preempted request
            # re-encodes its generated tokens too.
            num_new_tokens = request.num_tokens - num_cached
            assert num_new_tokens > 0
            # Contiguous full-sequence reservation: allocate the EXPECTED
            # final length (prompt + generation budget) in one grab, so
            # the row's pool pages form one ascending run — the decode
            # kernel's contiguous-chunk DMA streams a whole row in ONE
            # copy (ops/decode_attention, measured 0.354 vs 1.122 ms/call
            # at b80). Incremental per-window block growth scatters pages
            # and forfeits the fast path. Falls back to prompt-only
            # allocation under pool pressure (reservation is a layout
            # optimization, never an admission requirement).
            new_block_ids = None
            if self.scheduler_config.reserve_full_sequence:
                sp = request.sampling_params
                horizon = (sp.max_tokens
                           if sp.max_tokens is not None
                           else self.scheduler_config.decode_window)
                reserve = min(request.num_tokens + horizon,
                              self.max_model_len) - num_cached
                if reserve > num_new_tokens:
                    new_block_ids = self.kv_manager.allocate_slots(
                        request, reserve, computed_blocks)
            if new_block_ids is None:
                new_block_ids = self.kv_manager.allocate_slots(
                    request, num_new_tokens, computed_blocks)
            if new_block_ids is None:
                # Not enough KV blocks right now: wait for running decodes to
                # finish instead of thrashing them with preemption. Flag the
                # starvation so the adaptive-window policy stops shortening
                # windows for an admission that cannot happen (free decode
                # SEATS do not imply free KV — long-context regime).
                self._kv_starved = True
                break
            self._kv_starved = False
            self.waiting.popleft()
            request.status = RequestStatus.RUNNING
            request.num_computed_tokens = num_cached
            request.num_cached_tokens = num_cached
            request.num_context_tokens = request.num_tokens
            self.running.append(request)
            out.scheduled_new_reqs.append(
                NewRequestData(
                    req_id=request.req_id,
                    # Full known context (prompt + any pre-preemption output).
                    prompt_token_ids=list(request.all_token_ids),
                    block_ids=self.kv_manager.get_block_ids(request.req_id),
                    num_computed_tokens=num_cached,
                    sampling_params=request.sampling_params,
                    mm_inputs=request.mm_inputs,
                    lora_int_id=request.lora_int_id,
                ))
            out.num_scheduled_tokens[request.req_id] = num_new_tokens
            num_admitted += 1
        out.is_prefill_step = num_admitted > 0
        return num_admitted > 0

    def _schedule_decodes(self, out: SchedulerOutput,
                          max_window: int | None = None) -> None:
        cached = out.scheduled_cached_reqs
        skipped: list[Request] = []
        window = self.scheduler_config.decode_window
        if self.config.speculative.enabled:
            # One fused dispatch consumes up to W rounds x (1 + K)
            # positions (num_fused_rounds=1: the single classic round).
            window = (self.config.speculative.num_fused_rounds
                      * (1 + self.config.speculative.num_speculative_tokens))
        elif self.waiting and self._admission_imminent(window):
            # TTFT policy: a waiting request could be admitted within a
            # couple of steps — shorten the window so the prefill is not
            # gated behind a full one (config.decode_window_when_waiting).
            window = max(1, min(
                window, self.scheduler_config.decode_window_when_waiting))
        if max_window is not None:
            # Chunked-mode token budget (applies after every policy above —
            # the spec window override must not escape the budget either).
            window = max(1, min(window, max_window))
        scheduled_ids: set[str] = set()
        for request in list(self.running):
            if request.status != RequestStatus.RUNNING:
                # Preempted by an earlier iteration of this pass (its blocks
                # are already freed); it sits in waiting for re-admission.
                continue
            if request.spec_token_ids:
                num_new = 1 + len(request.spec_token_ids)
            else:
                # Multi-step decode window, clamped so KV slots never run
                # past max_model_len or the request's own token budget.
                sp = request.sampling_params
                remaining_len = self.max_model_len - request.num_tokens
                remaining_out = ((sp.max_tokens - request.num_output_tokens)
                                 if sp.max_tokens is not None else window)
                num_new = max(1, min(window, remaining_len, remaining_out))
            # With async decode the runner may dispatch the NEXT window
            # before this one is fetched; reserve its KV blocks now so the
            # speculative slot table is real.
            lookahead = window if self.scheduler_config.async_decode else 0
            num_alloc = max(1, min(num_new + lookahead,
                                   self.max_model_len -
                                   request.num_computed_tokens))
            new_block_ids = self.kv_manager.allocate_slots(request, num_alloc)
            while new_block_ids is None:
                # Never preempt a request already scheduled into THIS step:
                # its rows would write KV into blocks the pool may hand to a
                # later row of the same program (cross-request corruption).
                if not self._try_preempt(exclude=request,
                                         skip=scheduled_ids):
                    # Cannot free anything else: preempt this request itself.
                    self._preempt(request)
                    skipped.append(request)
                    break
                new_block_ids = self.kv_manager.allocate_slots(
                    request, num_alloc)
            if request in skipped:
                continue
            scheduled_ids.add(request.req_id)
            cached.req_ids.append(request.req_id)
            cached.new_block_ids.append(new_block_ids)
            cached.num_computed_tokens.append(request.num_computed_tokens)
            out.num_scheduled_tokens[request.req_id] = num_new
            if request.spec_token_ids:
                out.scheduled_spec_decode_tokens[request.req_id] = \
                    list(request.spec_token_ids)

    def _admission_imminent(self, window: int) -> bool:
        """True when a waiting request could plausibly be admitted within
        roughly one window: the decode batch has free slots (admission is
        blocked by KV pressure or the prefill/decode alternation, both of
        which can clear mid-window), or some running request is within a
        window of a KNOWN finish (max_tokens / max_model_len). A saturated
        batch with no predictable finish keeps full windows — stop-token
        finishes are unpredictable and shortening would only cost sync
        overhead. ``_kv_starved`` (set when the last admission attempt
        failed on block allocation, cleared when blocks free) guards the
        free-seat check: seats without KV cannot admit, and shortened
        windows would otherwise persist for hundreds of steps at ~4x the
        host syncs."""
        if len(self.running) < self.max_num_seqs and not self._kv_starved:
            return True
        for r in self.running:
            sp = r.sampling_params
            if self.max_model_len - r.num_tokens <= window:
                return True
            if sp.max_tokens is not None and \
                    sp.max_tokens - r.num_output_tokens <= window:
                return True
        return False

    def _try_preempt(self, exclude: Request,
                     skip: frozenset | set = frozenset()) -> bool:
        """Preempt the lowest-priority (most recently admitted) running
        request to reclaim blocks. ``skip`` holds req_ids already scheduled
        into the step being built — their block tables are committed to the
        dispatch and must stay live."""
        for request in reversed(self.running):
            if request is exclude or request.req_id in skip:
                continue
            self._preempt(request)
            return True
        return False

    def _preempt(self, request: Request) -> None:
        self._num_preemptions += 1
        logger.warning("preempting request %s (KV pool exhausted)",
                       request.req_id)
        self.running.remove(request)
        self.kv_manager.free(request)
        request.status = RequestStatus.PREEMPTED
        request.num_computed_tokens = 0
        request.num_cached_tokens = 0
        request.spec_token_ids = []
        # Recompute from scratch later; waiting front keeps FIFO fairness.
        self.waiting.appendleft(request)
        # The worker must drop its per-request state.
        self._finished_to_report.add(request.req_id)

    # -- chunked prefill mode -------------------------------------------

    def _schedule_chunked(self, out: SchedulerOutput) -> None:
        """Token-budget scheduling: decodes first (1 token each), then prompt
        chunks up to the budget (reference capability: model_runner.py:938-1051
        concatenated-row chunked prefill).

        With no prompt chunk pending, a chunked-mode step is just a decode
        step — take the windowed decode path (multi-step fused dispatch)
        instead of 1-token steps, whose per-step host sync capped chunked
        decode at 148 tok/s vs 362 on the same workload (round-4 4k bench,
        docs/PERF_NOTES.md)."""
        any_prefill = bool(self.waiting) or any(
            r.num_computed_tokens < r.num_context_tokens
            for r in self.running)
        if not any_prefill:
            # Chunked mode's per-step token budget still applies: clamp the
            # window so n_rows * window cannot exceed max_num_batched_tokens
            # (an unclamped window could schedule past the budget the rest
            # of chunked mode enforces — a memory/latency bound).
            cap = max(1, self.max_num_batched_tokens
                      // max(1, len(self.running)))
            self._schedule_decodes(out, max_window=cap)
            return
        budget = min(self.max_num_batched_tokens, self.chunk_size)
        cached = out.scheduled_cached_reqs
        for request in self.running:
            in_prefill = request.num_computed_tokens < \
                request.num_context_tokens
            if in_prefill:
                num_new = min(
                    request.num_context_tokens - request.num_computed_tokens,
                    budget)
            else:
                num_new = 1
            if num_new <= 0 or budget - num_new < 0:
                continue
            new_block_ids = self.kv_manager.allocate_slots(request, num_new)
            if new_block_ids is None:
                continue
            budget -= num_new
            cached.req_ids.append(request.req_id)
            cached.new_block_ids.append(new_block_ids)
            cached.num_computed_tokens.append(request.num_computed_tokens)
            out.num_scheduled_tokens[request.req_id] = num_new
            if budget == 0:
                break
        while self.waiting and budget > 0 and \
                len(self.running) < self.max_num_seqs:
            request = self.waiting[0]
            computed_blocks, num_cached = \
                self.kv_manager.get_computed_blocks(request)
            num_new = min(request.num_tokens - num_cached, budget)
            if num_new <= 0:
                break
            new_block_ids = self.kv_manager.allocate_slots(
                request, num_new, computed_blocks)
            if new_block_ids is None:
                break
            self.waiting.popleft()
            request.status = RequestStatus.RUNNING
            request.num_computed_tokens = num_cached
            request.num_cached_tokens = num_cached
            request.num_context_tokens = request.num_tokens
            self.running.append(request)
            budget -= num_new
            out.scheduled_new_reqs.append(
                NewRequestData(
                    req_id=request.req_id,
                    prompt_token_ids=list(request.all_token_ids),
                    block_ids=self.kv_manager.get_block_ids(request.req_id),
                    num_computed_tokens=num_cached,
                    sampling_params=request.sampling_params,
                    mm_inputs=request.mm_inputs,
                    lora_int_id=request.lora_int_id,
                ))
            out.num_scheduled_tokens[request.req_id] = num_new

    # ------------------------------------------------------------------
    # Output processing
    # ------------------------------------------------------------------

    def update_from_output(
            self, scheduler_output: SchedulerOutput,
            runner_output: ModelRunnerOutput) -> list[EngineCoreOutput]:
        outputs: list[EngineCoreOutput] = []
        for req_id, num_scheduled in \
                scheduler_output.num_scheduled_tokens.items():
            request = self.requests.get(req_id)
            if request is None or request.is_finished:
                continue  # aborted mid-step
            if request.status == RequestStatus.PREEMPTED:
                # Preempted after this step was scheduled: its bookkeeping
                # was reset for re-admission; discard the step's results.
                continue
            idx = runner_output.req_id_to_index.get(req_id)
            new_token_ids = (runner_output.sampled_token_ids[idx]
                             if idx is not None else [])
            # Uniform advance rule: context-encoding chunks advance by what
            # was scheduled; generation (decode windows, speculative steps)
            # advances by what was actually sampled — the runner may have run
            # fewer steps (host-sampling fallback) and stop conditions
            # discard window overshoot.
            if request.num_computed_tokens < request.num_context_tokens:
                request.num_computed_tokens += num_scheduled
            else:
                request.num_computed_tokens += len(new_token_ids)
            request.spec_token_ids = []
            if runner_output.spec_token_ids is not None and idx is not None:
                request.spec_token_ids = list(
                    runner_output.spec_token_ids[idx])

            stopped = False
            accepted: list[int] = []
            for tok in new_token_ids:
                request.append_output_token_ids(tok)
                accepted.append(tok)
                stopped = check_stop_with_min_tokens(request,
                                                     self.max_model_len)
                if stopped:
                    break
            logprobs = None
            if idx is not None and idx < len(runner_output.logprobs):
                logprobs = runner_output.logprobs[idx]
                if logprobs is not None and stopped:
                    logprobs = _trim_logprobs(logprobs, len(accepted))
            if accepted or stopped:
                outputs.append(
                    EngineCoreOutput(
                        req_id=req_id,
                        new_token_ids=accepted,
                        finished=request.is_finished,
                        finish_reason=FINISH_REASON.get(request.status),
                        stop_reason=request.stop_reason,
                        logprobs=logprobs,
                    ))
            self.kv_manager.cache_blocks(request)
            if request.is_finished:
                self.running.remove(request)
                self._finish(request)
        return outputs


def check_stop_with_min_tokens(request: Request, max_model_len: int) -> bool:
    """Token-level stop conditions, respecting min_tokens (behavioral match of
    reference check_stop_with_min_tokens, core/scheduler.py:130-166)."""
    sp = request.sampling_params
    max_tokens = sp.max_tokens if sp.max_tokens is not None else max_model_len
    if (request.num_tokens >= max_model_len
            or request.num_output_tokens >= max_tokens):
        request.status = RequestStatus.FINISHED_LENGTH_CAPPED
        return True
    if sp.min_tokens > 0 and request.num_output_tokens < sp.min_tokens:
        return False
    last = request.output_token_ids[-1]
    if not sp.ignore_eos and request.eos_token_id is not None and \
            last == request.eos_token_id:
        request.status = RequestStatus.FINISHED_STOPPED
        return True
    if last in sp._all_stop_token_ids:
        request.status = RequestStatus.FINISHED_STOPPED
        request.stop_reason = last
        return True
    return False


def _trim_logprobs(logprobs, n: int):
    from vllm_neuron_tpu.core.sched_output import LogprobsOutput
    return LogprobsOutput(token_ids=logprobs.token_ids[:n],
                          logprobs=logprobs.logprobs[:n],
                          sampled_ranks=logprobs.sampled_ranks[:n])
