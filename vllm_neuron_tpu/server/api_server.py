# SPDX-License-Identifier: Apache-2.0
"""OpenAI-compatible API server.

TPU-native equivalent of the serving surface the reference gets from
``python3 -m vllm.entrypoints.openai.api_server`` (reference:
test/utils/server/start_server.sh:70-141; README.md:69-84): /health,
/v1/models, /v1/completions, /v1/chat/completions with SSE streaming, chat
templates, and auto tool choice with the llama3_json parser.

Run: ``python -m vllm_neuron_tpu.server.api_server --model <path> [...]``
"""
from __future__ import annotations

import argparse
import asyncio
import json
from typing import AsyncIterator, Optional

from vllm_neuron_tpu.engine.async_llm import AsyncEngine
from vllm_neuron_tpu.engine.llm import build_engine_config
from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.server.http import (HTTPServer, JSONResponse, Request,
                                         StreamingResponse, TextResponse)
from vllm_neuron_tpu.server.protocol import (UsageInfo, make_id, now,
                                             sampling_from_body)
from vllm_neuron_tpu.server.tool_parser import TOOL_PARSERS
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class OpenAIServer:

    def __init__(self, engine: AsyncEngine, served_model_name: str,
                 chat_template: Optional[str] = None,
                 enable_auto_tools: bool = False,
                 tool_parser: Optional[str] = None,
                 lora_modules: Optional[dict] = None,
                 reasoning_parser: Optional[str] = None):
        self.engine = engine
        self.model_name = served_model_name
        # Registered LoRA adapters are served as additional model names
        # (the vLLM ``--lora-modules`` convention): requesting
        # model=<adapter> routes through that adapter (lora_loader.py).
        self.lora_names = list(lora_modules or {})
        self.tokenizer = engine.tokenizer
        self.chat_template = chat_template
        self.enable_auto_tools = enable_auto_tools
        self.tool_parser = TOOL_PARSERS.get(tool_parser) if tool_parser \
            else None
        from vllm_neuron_tpu.server.reasoning import REASONING_PARSERS
        self.reasoning_parser = (REASONING_PARSERS.get(reasoning_parser)
                                 if reasoning_parser else None)
        if reasoning_parser and self.reasoning_parser is None:
            raise ValueError(
                f"unknown reasoning parser {reasoning_parser!r}; "
                f"available: {sorted(REASONING_PARSERS)}")
        self.app = HTTPServer()
        self._register()

    # ------------------------------------------------------------------

    def _register(self):
        app = self.app
        app.route("GET", "/health")(self.health)
        app.route("GET", "/v1/models")(self.list_models)
        app.route("POST", "/v1/completions")(self.completions)
        app.route("POST", "/v1/chat/completions")(self.chat_completions)
        app.route("GET", "/metrics")(self.metrics)

    async def health(self, request: Request):
        if not self.engine.check_health():
            return JSONResponse({"status": "unhealthy"}, 503)
        return JSONResponse({"status": "ok"})

    async def list_models(self, request: Request):
        return JSONResponse({
            "object": "list",
            "data": [{
                "id": self.model_name,
                "object": "model",
                "created": now(),
                "owned_by": "vllm-neuron-tpu",
            }] + [{
                "id": name,
                "object": "model",
                "created": now(),
                "owned_by": "vllm-neuron-tpu",
                "parent": self.model_name,
            } for name in self.lora_names],
        })

    def _resolve_lora(self, body: dict) -> Optional[str]:
        """Request model name -> adapter name (None = base model)."""
        name = body.get("model")
        if name in self.lora_names:
            return name
        if name not in (None, self.model_name):
            raise ValueError(f"unknown model {name!r}; served: "
                             f"{[self.model_name] + self.lora_names}")
        return None

    async def metrics(self, request: Request):
        if "json" in request.headers.get("accept", ""):
            return JSONResponse(self.engine.metrics.snapshot())
        return TextResponse(self.engine.metrics.prometheus())

    # ------------------------------------------------------------------
    # /v1/completions
    # ------------------------------------------------------------------

    def _tokenize_prompt(self, prompt) -> tuple[list[int], Optional[str]]:
        if isinstance(prompt, list) and prompt and \
                isinstance(prompt[0], int):
            return list(prompt), None
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("server started without a tokenizer; send "
                                 "token-id prompts")
            return self.tokenizer.encode(prompt), prompt
        raise ValueError("`prompt` must be a string or a list of token ids")

    async def completions(self, request: Request):
        body = request.json()
        prompts = body.get("prompt")
        if prompts is None:
            raise ValueError("`prompt` is required")
        if isinstance(prompts, str) or (isinstance(prompts, list) and prompts
                                        and isinstance(prompts[0], int)):
            prompts = [prompts]
        sp = sampling_from_body(body, max_tokens_default=16)
        stream = bool(body.get("stream", False))
        lora = self._resolve_lora(body)
        completion_id = make_id("cmpl")
        if stream:
            if len(prompts) != 1 or sp.n != 1:
                raise ValueError("streaming supports a single prompt, n=1")
            token_ids, _ = self._tokenize_prompt(prompts[0])
            return StreamingResponse(
                self._stream_completion(completion_id, token_ids, sp, lora))
        return await self._full_completion(completion_id, prompts, sp, body,
                                           lora)

    async def _full_completion(self, completion_id, prompts, sp, body,
                               lora=None):
        usage = UsageInfo()
        choices = []
        tasks = []
        for prompt in prompts:
            token_ids, text = self._tokenize_prompt(prompt)
            # n>1 siblings share the first sibling's prompt blocks in the
            # scheduler (no re-prefill); pre-assign ids to link them.
            group_parent = None
            for child in range(sp.n):
                child_sp = sp
                if sp.n > 1 and sp.seed is not None:
                    import dataclasses
                    child_sp = dataclasses.replace(sp, seed=sp.seed + child)
                    child_sp.__post_init__()
                req_id = self.engine.next_request_id()
                tasks.append((req_id, token_ids, child_sp, group_parent))
                if group_parent is None:
                    group_parent = req_id
        results = await asyncio.gather(*[
            self._collect(token_ids, child_sp, lora, request_id=req_id,
                          parent_req_id=parent)
            for req_id, token_ids, child_sp, parent in tasks
        ])
        for i, out in enumerate(results):
            comp = out.outputs[0]
            usage.prompt_tokens += len(out.prompt_token_ids)
            usage.completion_tokens += len(comp.token_ids)
            choices.append({
                "index": i,
                "text": comp.text,
                "logprobs": _format_logprobs(comp, self.tokenizer),
                "finish_reason": comp.finish_reason,
                "stop_reason": comp.stop_reason,
            })
        return JSONResponse({
            "id": completion_id,
            "object": "text_completion",
            "created": now(),
            "model": self.model_name,
            "choices": choices,
            "usage": usage.to_dict(),
        })

    async def _collect(self, token_ids: list[int], sp: SamplingParams,
                       lora=None, request_id=None, parent_req_id=None):
        last = None
        async for out in self.engine.generate(token_ids, sp,
                                              lora_request=lora,
                                              request_id=request_id,
                                              parent_req_id=parent_req_id):
            last = out
        return last

    async def _stream_completion(self, completion_id, token_ids, sp,
                                 lora=None) -> AsyncIterator[str]:
        sent_len = 0
        async for out in self.engine.generate(token_ids, sp,
                                              lora_request=lora):
            comp = out.outputs[0]
            delta = comp.text[sent_len:]
            sent_len = len(comp.text)
            if not delta and not out.finished:
                continue
            yield json.dumps({
                "id": completion_id,
                "object": "text_completion",
                "created": now(),
                "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "text": delta,
                    "logprobs": None,
                    "finish_reason": comp.finish_reason if out.finished
                    else None,
                }],
            })

    # ------------------------------------------------------------------
    # /v1/chat/completions
    # ------------------------------------------------------------------

    def _apply_chat_template(self, messages: list[dict],
                             tools: Optional[list] = None) -> list[int]:
        if self.tokenizer is None:
            raise ValueError("chat API requires a tokenizer")
        kwargs = {"add_generation_prompt": True}
        if self.chat_template:
            kwargs["chat_template"] = self.chat_template
        if tools:
            kwargs["tools"] = tools
        return self.tokenizer.apply_chat_template(messages, **kwargs)

    async def chat_completions(self, request: Request):
        body = request.json()
        messages = body.get("messages")
        if not messages:
            raise ValueError("`messages` is required")
        tools = body.get("tools")
        tool_choice = body.get("tool_choice", "auto" if tools else "none")
        forced_name = None
        if isinstance(tool_choice, dict):
            # Named tool_choice: {"type": "function", "function":
            # {"name": X}} — the model sees ONLY tool X and the response
            # is committed to calling it (reference surface: vLLM OpenAI
            # server named tool_choice, test/e2e/online/configs.py:118-135).
            forced_name = (tool_choice.get("function") or {}).get("name")
            if not forced_name:
                raise ValueError(
                    "tool_choice object requires function.name")
            if not any((t.get("function") or {}).get("name") == forced_name
                       for t in tools or []):
                raise ValueError(
                    f"tool_choice names unknown tool {forced_name!r}")
        use_tools = bool(tools) and tool_choice != "none" and \
            (forced_name is not None or self.enable_auto_tools
             or tool_choice != "auto")
        tmpl_tools = tools
        if forced_name is not None:
            tmpl_tools = [t for t in tools
                          if (t.get("function") or {}).get("name")
                          == forced_name]
        token_ids = self._apply_chat_template(
            messages, tmpl_tools if use_tools else None)
        sp = sampling_from_body(body, max_tokens_default=1024)
        lora = self._resolve_lora(body)
        chat_id = make_id("chatcmpl")
        if body.get("stream", False):
            return StreamingResponse(
                self._stream_chat(chat_id, token_ids, sp, lora,
                                  tools_active=use_tools and
                                  self.tool_parser is not None,
                                  forced_name=forced_name))
        out = await self._collect(token_ids, sp, lora)
        comp = out.outputs[0]
        reasoning = None
        raw = comp.text
        if self.reasoning_parser is not None:
            reasoning, raw = self.reasoning_parser.parse(raw)
        tool_calls, content = None, raw
        if use_tools and self.tool_parser is not None:
            tool_calls, content = self.tool_parser(raw)
            if forced_name is not None:
                tool_calls, content = _force_named_call(
                    raw, tool_calls, forced_name)
        message: dict = {"role": "assistant", "content": content or None}
        if reasoning:
            message["reasoning_content"] = reasoning
        finish_reason = comp.finish_reason
        if tool_calls:
            message["tool_calls"] = [{
                "id": tc.id,
                "type": "function",
                "function": {"name": tc.name, "arguments": tc.arguments},
            } for tc in tool_calls]
            finish_reason = "tool_calls"
        usage = UsageInfo(prompt_tokens=len(out.prompt_token_ids),
                          completion_tokens=len(comp.token_ids))
        return JSONResponse({
            "id": chat_id,
            "object": "chat.completion",
            "created": now(),
            "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": message,
                "logprobs": _format_chat_logprobs(comp, self.tokenizer),
                "finish_reason": finish_reason,
            }],
            "usage": usage.to_dict(),
        })

    async def _stream_chat(self, chat_id, token_ids, sp, lora=None,
                           tools_active: bool = False,
                           forced_name: Optional[str] = None
                           ) -> AsyncIterator[str]:
        def chunk(delta: dict, finish: Optional[str] = None) -> str:
            return json.dumps({
                "id": chat_id,
                "object": "chat.completion.chunk",
                "created": now(),
                "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "delta": delta,
                    "finish_reason": finish,
                }],
            })

        yield chunk({"role": "assistant", "content": ""})
        sent_len = 0
        splitter = (self.reasoning_parser.stream()
                    if self.reasoning_parser is not None else None)
        tool_stream = None
        if tools_active:
            from vllm_neuron_tpu.server.tool_stream import (
                StreamingToolCallParser)
            tool_stream = StreamingToolCallParser(forced_name=forced_name)

        def route_content(c_delta: str):
            # Content deltas optionally pass through the incremental
            # tool-call parser, which turns llama3_json output into
            # OpenAI tool_calls deltas as the JSON streams out.
            if tool_stream is None:
                return [{"content": c_delta}]
            return tool_stream.feed(c_delta)

        async for out in self.engine.generate(token_ids, sp,
                                              lora_request=lora):
            comp = out.outputs[0]
            delta = comp.text[sent_len:]
            sent_len = len(comp.text)
            if delta and splitter is not None:
                r_delta, c_delta = splitter.feed(delta)
                if r_delta:
                    yield chunk({"reasoning_content": r_delta})
                if c_delta:
                    for ev in route_content(c_delta):
                        yield chunk(ev)
            elif delta:
                for ev in route_content(delta):
                    yield chunk(ev)
            if out.finished:
                if splitter is not None:
                    r_tail, c_tail = splitter.flush()
                    if r_tail:
                        yield chunk({"reasoning_content": r_tail})
                    if c_tail:
                        for ev in route_content(c_tail):
                            yield chunk(ev)
                if tool_stream is not None:
                    for ev in tool_stream.flush():
                        yield chunk(ev)
                finish = comp.finish_reason
                if tool_stream is not None and tool_stream.saw_tool_calls:
                    finish = "tool_calls"
                yield chunk({}, finish=finish)


def _force_named_call(raw, tool_calls, forced_name):
    """Commit a response to the named tool (tool_choice = {"type":
    "function", ...}). The model was shown only that tool, so output is
    either a full call object (parsed upstream) or a bare arguments
    object; either way the response MUST carry a call to ``forced_name``
    (reference surface: vLLM OpenAI named tool_choice,
    test/e2e/online/configs.py:118-135)."""
    from vllm_neuron_tpu.server.tool_parser import (PYTHON_TAG, ToolCall)
    if tool_calls:
        # Keep only calls to the forced tool; rename stray names (the
        # model saw exactly one tool, so a mismatched name is noise).
        calls = [ToolCall(name=forced_name, arguments=c.arguments, id=c.id)
                 for c in tool_calls]
        return calls, ""
    stripped = raw.strip()
    if stripped.startswith(PYTHON_TAG):
        stripped = stripped[len(PYTHON_TAG):].strip()
    args = "{}"
    try:
        obj = json.loads(stripped)
        if isinstance(obj, dict):
            args = json.dumps(obj.get("parameters",
                                      obj.get("arguments", obj)),
                              ensure_ascii=False)
    except json.JSONDecodeError:
        pass
    return [ToolCall(name=forced_name, arguments=args,
                     id=make_id("chatcmpl-tool"))], ""


def _format_logprobs(comp, tokenizer):
    if comp.logprobs is None:
        return None
    token_logprobs, tokens, top = [], [], []
    for lp_map in comp.logprobs:
        if not lp_map:
            continue
        best_tok = max(lp_map, key=lp_map.get)
        sampled = None
        # The sampled token is recorded first in insertion order.
        sampled = next(iter(lp_map))
        token_logprobs.append(lp_map[sampled])
        tokens.append(tokenizer.decode([sampled]) if tokenizer else
                      str(sampled))
        top.append({(tokenizer.decode([t]) if tokenizer else str(t)): v
                    for t, v in lp_map.items()})
    return {"tokens": tokens, "token_logprobs": token_logprobs,
            "top_logprobs": top, "text_offset": []}


def _format_chat_logprobs(comp, tokenizer):
    if comp.logprobs is None:
        return None
    content = []
    for lp_map in comp.logprobs:
        if not lp_map:
            continue
        sampled = next(iter(lp_map))
        tok_str = tokenizer.decode([sampled]) if tokenizer else str(sampled)
        content.append({
            "token": tok_str,
            "logprob": lp_map[sampled],
            "top_logprobs": [{
                "token": (tokenizer.decode([t]) if tokenizer else str(t)),
                "logprob": v,
            } for t, v in lp_map.items()],
        })
    return {"content": content}


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="vllm-neuron-tpu OpenAI server")
    p.add_argument("--model", required=True)
    p.add_argument("--served-model-name", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--max-num-seqs", type=int, default=32)
    p.add_argument("--max-num-batched-tokens", type=int, default=None)
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--num-gpu-blocks-override", type=int, default=None)
    p.add_argument("--tensor-parallel-size", type=int, default=1)
    p.add_argument("--enable-prefix-caching", action="store_true")
    p.add_argument("--enable-chunked-prefill", action="store_true")
    p.add_argument("--quantization", default=None)
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--speculative-config", type=json.loads, default=None)
    p.add_argument("--override-tpu-config", type=json.loads, default=None)
    p.add_argument("--enable-auto-tool-choice", action="store_true")
    p.add_argument("--reasoning-parser", default=None,
                   help="split <think> blocks into reasoning_content "
                   "(deepseek_r1, qwen3)")
    p.add_argument("--tool-call-parser", default=None,
                   choices=sorted(TOOL_PARSERS))
    p.add_argument("--chat-template", default=None,
                   help="path to a jinja chat template file")
    p.add_argument("--lora-modules", nargs="*", default=None,
                   help="LoRA adapters to serve, as name=path pairs "
                        "(requests select one via the `model` field)")
    p.add_argument("--skip-warmup", action="store_true",
                   help="skip pre-compiling all reachable program variants "
                        "at startup (reference analogue: skip_warmup); "
                        "programs then compile lazily on first use")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="auto", choices=["auto", "cpu"],
                   help="'cpu' pins jax to the host backend (tests/CI; "
                   "the JAX_PLATFORMS env var is unreliable when a TPU "
                   "plugin pins the platform at import)")
    # Multi-host (pod slice) bootstrap: run the same command on every host;
    # the leader serves HTTP, followers enter the lockstep loop.
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="leader address host:port for jax.distributed")
    return p


async def run_server(args) -> None:
    if getattr(args, "device", "auto") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.num_hosts > 1:
        from vllm_neuron_tpu.parallel.mesh import initialize_distributed
        initialize_distributed(coordinator=args.coordinator,
                               num_processes=args.num_hosts,
                               process_id=args.host_id)
    lora_adapters = {}
    for spec in args.lora_modules or []:
        name, _, path = spec.partition("=")
        if not path:
            raise ValueError(f"--lora-modules entries must be name=path, "
                             f"got {spec!r}")
        lora_adapters[name] = path
    config = build_engine_config(
        args.model,
        tokenizer=args.tokenizer,
        dtype=args.dtype,
        max_model_len=args.max_model_len,
        max_num_seqs=args.max_num_seqs,
        max_num_batched_tokens=args.max_num_batched_tokens,
        block_size=args.block_size,
        num_blocks=args.num_gpu_blocks_override,
        enable_prefix_caching=args.enable_prefix_caching,
        enable_chunked_prefill=args.enable_chunked_prefill,
        tensor_parallel_size=args.tensor_parallel_size,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
        speculative_config=args.speculative_config,
        override_tpu_config=args.override_tpu_config,
        lora_adapters=lora_adapters,
        seed=args.seed,
    )
    if args.num_hosts > 1:
        from vllm_neuron_tpu.parallel import multihost
        if not multihost.is_leader():
            # Follower hosts never serve HTTP or schedule: they build the
            # same worker (device mesh + sharded params + executor) and
            # replay the leader's dispatch bundles until shutdown
            # (reference contract: non-driver workers return None,
            # vllm_neuron/worker/neuron_worker.py:68-69).
            from vllm_neuron_tpu.parallel.multihost import FollowerLoop
            from vllm_neuron_tpu.worker.worker import Worker
            worker = Worker(config)
            worker.init_device()
            worker.load_model()
            FollowerLoop(worker).run_forever()
            return
    tokenizer = None
    try:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(config.model.tokenizer)
    except Exception as e:
        logger.warning("tokenizer unavailable (%s)", e)
    chat_template = None
    if args.chat_template:
        with open(args.chat_template) as f:
            chat_template = f.read()
    engine = AsyncEngine(config, tokenizer=tokenizer)
    if not args.skip_warmup:
        # Serve-time default: pre-compile every reachable program variant
        # so no request (logprobs, seeds, speculation, long prompts) hits
        # a cold compile mid-serving. Executables persist in the compile
        # cache, so a redeploy of the same config warms from disk.
        engine.warmup()
    engine.start(asyncio.get_running_loop())
    server = OpenAIServer(
        engine,
        served_model_name=args.served_model_name or args.model,
        chat_template=chat_template,
        enable_auto_tools=args.enable_auto_tool_choice,
        tool_parser=args.tool_call_parser,
        lora_modules=lora_adapters,
        reasoning_parser=args.reasoning_parser,
    )
    try:
        http = await server.app.serve(args.host, args.port)
        async with http:
            await http.serve_forever()
    finally:
        # Release follower hosts from the lockstep loop before exiting.
        from vllm_neuron_tpu.parallel import multihost
        multihost.broadcast_shutdown()


def main():
    args = build_parser().parse_args()
    asyncio.run(run_server(args))


if __name__ == "__main__":
    main()
