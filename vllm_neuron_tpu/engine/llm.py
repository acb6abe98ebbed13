# SPDX-License-Identifier: Apache-2.0
"""Offline inference API: ``LLM(model=...).generate(...)``.

Mirrors the vLLM `LLM` surface the reference's users and tests drive
(reference: README.md:28-66, every test/tiny/*). Accepts text prompts (needs
a tokenizer) or ``{"prompt_token_ids": [...]}`` dicts."""
from __future__ import annotations

import itertools
from typing import Optional, Sequence, Union

from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                    EngineConfig, LoRAConfig, ModelConfig,
                                    ParallelConfig, QuantConfig,
                                    SamplerConfig, SchedulerConfig,
                                    SpeculativeConfig)
from vllm_neuron_tpu.engine.core import EngineCore
from vllm_neuron_tpu.engine.outputs import CompletionOutput, RequestOutput
from vllm_neuron_tpu.sampling.params import SamplingParams
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

PromptType = Union[str, dict]


def build_engine_config(
    model: str,
    *,
    tokenizer: Optional[str] = None,
    dtype: str = "bfloat16",
    max_model_len: Optional[int] = None,
    max_num_seqs: int = 32,
    max_num_batched_tokens: Optional[int] = None,
    block_size: Optional[int] = None,
    num_blocks: Optional[int] = None,
    enable_prefix_caching: bool = False,
    enable_chunked_prefill: bool = False,
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    sequence_parallel: bool = False,
    expert_parallel_size: int = 1,
    speculative_config: Optional[dict] = None,
    quantization: Optional[str] = None,
    kv_cache_dtype: str = "auto",
    on_device_sampling: Optional[bool] = None,
    override_tpu_config: Optional[dict] = None,
    lora_adapters: Optional[dict] = None,
    seed: int = 0,
) -> EngineConfig:
    """Flat-kwargs -> config-tree assembly (the reference spreads this across
    vLLM CLI args + override_neuron_config + env vars; model_loader.py:725-900).
    """
    model_config = ModelConfig(model=model, tokenizer=tokenizer, dtype=dtype,
                               max_model_len=max_model_len, seed=seed)
    sched = SchedulerConfig(
        max_num_seqs=max_num_seqs,
        enable_chunked_prefill=enable_chunked_prefill,
    )
    if max_num_batched_tokens is not None:
        sched.max_num_batched_tokens = max_num_batched_tokens
    cache = CacheConfig(block_size=block_size, num_blocks=num_blocks,
                        enable_prefix_caching=enable_prefix_caching,
                        kv_cache_dtype=kv_cache_dtype)
    spec = SpeculativeConfig()
    if speculative_config:
        spec = SpeculativeConfig(
            model=speculative_config.get("model"),
            num_speculative_tokens=speculative_config.get(
                "num_speculative_tokens", 0),
            method=speculative_config.get("method", "eagle"),
            num_fused_rounds=speculative_config.get("num_fused_rounds", 1),
        )
    sampler = SamplerConfig()
    if on_device_sampling is not None:
        sampler.on_device_sampling = on_device_sampling
    bucketing = BucketingConfig()
    quant = QuantConfig(quantization=quantization)
    if override_tpu_config:
        # Kernel/bucketing knobs (reference analogue: override_neuron_config
        # deep-merge, model_loader.py:870-900).
        for key, value in override_tpu_config.items():
            if hasattr(bucketing, key):
                setattr(bucketing, key, value)
            elif hasattr(sampler, key):
                setattr(sampler, key, value)
            elif hasattr(quant, key):
                setattr(quant, key, value)
            elif hasattr(sched, key):
                setattr(sched, key, value)
            else:
                raise ValueError(f"unknown override_tpu_config key {key!r}")
    return EngineConfig(
        model=model_config,
        cache=cache,
        scheduler=sched,
        parallel=ParallelConfig(
            tensor_parallel_size=tensor_parallel_size,
            data_parallel_size=data_parallel_size,
            sequence_parallel=sequence_parallel,
            expert_parallel_size=expert_parallel_size,
        ),
        bucketing=bucketing,
        speculative=spec,
        quant=quant,
        lora=LoRAConfig(adapters=dict(lora_adapters or {})),
        sampler=sampler,
    )


class LLM:

    def __init__(self, model: str, skip_tokenizer_init: bool = False,
                 **kwargs):
        self.config = build_engine_config(model, **kwargs)
        self.tokenizer = None
        if not skip_tokenizer_init:
            try:
                from transformers import AutoTokenizer
                self.tokenizer = AutoTokenizer.from_pretrained(
                    self.config.model.tokenizer)
            except Exception as e:
                logger.warning(
                    "tokenizer unavailable (%s); text prompts disabled", e)
        from vllm_neuron_tpu.engine.dp import make_engine
        self.engine = make_engine(self.config, tokenizer=self.tokenizer)
        self._req_counter = itertools.count()

    # ------------------------------------------------------------------

    def _to_token_ids(self, prompt: PromptType
                      ) -> tuple[list[int], Optional[str], Optional[dict]]:
        mm_inputs = None
        if isinstance(prompt, dict):
            mm = prompt.get("multi_modal_data")
            if mm:
                import numpy as np
                if "pixel_values" in mm:
                    mm_inputs = {k: np.asarray(v) for k, v in mm.items()}
                elif "image" in mm:
                    # Raw image(s): run the checkpoint's HF image processor
                    # (reference analogue: AutoProcessor preprocessing,
                    # test/e2e multimodal flows).
                    mm_inputs = self._process_images(mm["image"])
                else:
                    raise ValueError(
                        "multi_modal_data must carry 'pixel_values' "
                        "(preprocessed) or 'image' (raw; requires an "
                        "image-processor config in the checkpoint dir)")
            if "prompt_token_ids" in prompt:
                return (list(prompt["prompt_token_ids"]),
                        prompt.get("prompt"), mm_inputs)
            prompt = prompt["prompt"]
        if self.tokenizer is None:
            raise ValueError("text prompts require a tokenizer; pass "
                             "{'prompt_token_ids': [...]} instead")
        return self.tokenizer.encode(prompt), prompt, mm_inputs

    def _process_images(self, images) -> dict:
        """Preprocess raw image(s) with the checkpoint's HF image processor
        (lazily loaded; preprocessor_config.json must ship with the model).
        Returns the processor's arrays (pixel_values [+ aspect_ratio_* for
        tiled families like Mllama])."""
        import numpy as np
        if getattr(self, "_image_processor", None) is None:
            from transformers import AutoImageProcessor
            self._image_processor = AutoImageProcessor.from_pretrained(
                self.config.model.model)
        out = self._image_processor(images=images, return_tensors="np")
        return {k: np.asarray(v) for k, v in out.items()
                if isinstance(v, (list, np.ndarray)) or hasattr(v, "shape")}

    def generate(
        self,
        prompts: Union[PromptType, Sequence[PromptType]],
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        lora_request=None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        n_prompts = len(prompts)
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * n_prompts
        assert len(sampling_params) == n_prompts

        # Fan out n>1 into child requests sharing the prompt (prefix caching
        # makes the shared prefill cheap).
        parent_of: dict[str, tuple[int, int]] = {}
        for i, (prompt, sp) in enumerate(zip(prompts, sampling_params)):
            # Per-prompt {"lora": name} overrides the call-level adapter
            # (lora_loader.py; reference LoRA surface: SURVEY.md V9).
            lora = (prompt.get("lora", lora_request)
                    if isinstance(prompt, dict) else lora_request)
            token_ids, text, mm_inputs = self._to_token_ids(prompt)
            group_parent = None
            for child in range(sp.n):
                req_id = f"req-{next(self._req_counter)}"
                parent_of[req_id] = (i, child)
                child_sp = sp
                if sp.n > 1 and sp.seed is not None:
                    import dataclasses
                    child_sp = dataclasses.replace(sp, seed=sp.seed + child)
                    child_sp.__post_init__()
                self.engine.add_request(req_id, token_ids, child_sp,
                                        prompt=text, mm_inputs=mm_inputs,
                                        lora_request=lora,
                                        parent_req_id=group_parent)
                if group_parent is None:
                    group_parent = req_id

        latest: dict[str, RequestOutput] = {}
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                latest[out.request_id] = out

        # Group children back under their parents.
        results: list[Optional[RequestOutput]] = [None] * n_prompts
        for req_id, (i, child) in sorted(parent_of.items(),
                                         key=lambda kv: kv[1]):
            out = latest[req_id]
            completion = out.outputs[0]
            completion.index = child
            if results[i] is None:
                results[i] = RequestOutput(
                    request_id=out.request_id,
                    prompt=out.prompt,
                    prompt_token_ids=out.prompt_token_ids,
                    outputs=[],
                    finished=True,
                )
            results[i].outputs.append(completion)
        return results

    def get_metrics(self) -> dict:
        return self.engine.metrics.snapshot()
