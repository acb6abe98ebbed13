# SPDX-License-Identifier: Apache-2.0
"""AsyncEngine: asyncio front half over the synchronous EngineCore.

TPU-native analogue of vLLM's AsyncLLM (which the reference's OpenAI server
drives, SURVEY.md §3.3). The engine loop runs in a dedicated thread (device
steps are blocking); results cross into asyncio via call_soon_threadsafe.
Each request gets an async generator yielding incremental RequestOutputs.
"""
from __future__ import annotations

import asyncio
import itertools
import threading
from typing import AsyncIterator, Optional

from vllm_neuron_tpu.config import EngineConfig
from vllm_neuron_tpu.engine.core import EngineCore
from vllm_neuron_tpu.engine.outputs import RequestOutput
from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class AsyncEngine:

    def __init__(self, config: EngineConfig, tokenizer=None):
        self.config = config
        self.tokenizer = tokenizer
        from vllm_neuron_tpu.engine.dp import make_engine
        self.engine = make_engine(config, tokenizer=tokenizer)
        self._queues: dict[str, asyncio.Queue] = {}
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._new_requests: list = []
        self._aborts: list[str] = []
        self._lock = threading.Lock()
        self._wakeup = threading.Event()
        self._shutdown = False
        self._thread: Optional[threading.Thread] = None
        self._req_counter = itertools.count()

    def warmup(self) -> None:
        """Pre-compile all reachable program variants (call before start())."""
        self.engine.warmup()

    # ------------------------------------------------------------------

    def start(self, loop: Optional[asyncio.AbstractEventLoop] = None) -> None:
        self._loop = loop or asyncio.get_event_loop()
        self._thread = threading.Thread(target=self._run_loop,
                                        name="engine-loop", daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._shutdown = True
        self._wakeup.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def _run_loop(self) -> None:
        """The engine thread: admit new requests, step, publish outputs."""
        while not self._shutdown:
            with self._lock:
                new, self._new_requests = self._new_requests, []
                aborts, self._aborts = self._aborts, []
            for req_id, token_ids, sp, prompt, lora, parent in new:
                try:
                    self.engine.add_request(req_id, token_ids, sp,
                                            prompt=prompt,
                                            lora_request=lora,
                                            parent_req_id=parent)
                except Exception as e:  # invalid request (too long, ...)
                    self._publish_error(req_id, e)
            for req_id in aborts:
                self.engine.abort_request(req_id)
            if not self.engine.has_unfinished_requests():
                self._wakeup.wait(timeout=0.1)
                self._wakeup.clear()
                continue
            try:
                for out in self.engine.step():
                    self._publish(out.request_id, out)
            except Exception:
                logger.exception("engine step failed")
                raise

    def _publish(self, req_id: str, item) -> None:
        queue = self._queues.get(req_id)
        if queue is None or self._loop is None:
            return
        self._loop.call_soon_threadsafe(queue.put_nowait, item)

    def _publish_error(self, req_id: str, exc: Exception) -> None:
        self._publish(req_id, exc)

    # ------------------------------------------------------------------

    def next_request_id(self) -> str:
        return f"req-{next(self._req_counter)}"

    async def generate(
        self,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        request_id: Optional[str] = None,
        prompt: Optional[str] = None,
        lora_request=None,
        parent_req_id: Optional[str] = None,
    ) -> AsyncIterator[RequestOutput]:
        """Submit a request; yields incremental RequestOutputs until
        finished. Cancelling the iterator aborts the request.
        ``parent_req_id`` marks an n>1 sibling whose prompt blocks the
        scheduler shares instead of re-prefilling."""
        req_id = request_id or self.next_request_id()
        queue: asyncio.Queue = asyncio.Queue()
        self._queues[req_id] = queue
        with self._lock:
            self._new_requests.append(
                (req_id, prompt_token_ids, sampling_params, prompt,
                 lora_request, parent_req_id))
        self._wakeup.set()
        try:
            while True:
                item = await queue.get()
                if isinstance(item, Exception):
                    raise item
                yield item
                if item.finished:
                    return
        finally:
            self._queues.pop(req_id, None)
            with self._lock:
                self._aborts.append(req_id)
            self._wakeup.set()

    def check_health(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    @property
    def metrics(self):
        return self.engine.metrics
