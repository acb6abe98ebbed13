# SPDX-License-Identifier: Apache-2.0
"""Engine configuration tree.

One dataclass tree replaces the reference's three-layer config system
(vLLM CLI kwargs + ``override_neuron_config`` deep-merge + env vars;
reference: vllm_neuron/worker/neuronx_distributed_model_loader.py:725-900,
vllm_neuron/platform.py:131-210). Policies carried over:

- default ``max_num_batched_tokens`` = 131072 (platform.py:188)
- default ``max_num_seqs`` = 32 (platform.py:196-201)
- ``block_size`` falls back to ``max_model_len`` (contiguous KV) when prefix
  caching is off (platform.py:203-207)
- required KV blocks = ceil(max_model_len/block_size) * max_num_seqs plus a
  reserved null block (model_loader.py:741-745) — unlike the reference's
  error-prone external "+1" (platform.py:149-159), the null block is allocated
  internally by the block pool and never exposed to users.
"""
from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field, asdict
from typing import Any, Optional

import jax.numpy as jnp

from vllm_neuron_tpu.utils import cdiv, init_logger

logger = init_logger(__name__)

_DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.bfloat16,  # TPU has no fp16 MXU path; map to bf16
    "half": jnp.bfloat16,
    "auto": jnp.bfloat16,
    # FP8 KV cache storage (reference analogue: fbgemm_fp8 / kv quant,
    # platform.py:30).
    "fp8": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "float8_e4m3fn": jnp.float8_e4m3fn,
}


def resolve_dtype(dtype: Any):
    if isinstance(dtype, str):
        try:
            return _DTYPE_MAP[dtype]
        except KeyError:
            raise ValueError(f"unsupported dtype {dtype!r}") from None
    return dtype


@dataclass
class ModelConfig:
    """Model identity + architecture hyperparameters (from the HF config)."""

    model: str  # local path to an HF-format checkpoint directory
    tokenizer: Optional[str] = None
    dtype: Any = "bfloat16"
    max_model_len: Optional[int] = None
    seed: int = 0
    hf_config: Any = None  # transformers.PretrainedConfig, loaded lazily
    hf_overrides: Optional[dict] = None
    # "auto": load safetensors from `model`; "random": randomly initialized
    # weights (benchmarks / dryruns without a checkpoint on disk).
    load_format: str = "auto"

    def __post_init__(self):
        self.dtype = resolve_dtype(self.dtype)
        if self.tokenizer is None:
            self.tokenizer = self.model
        if self.hf_config is None:
            from transformers import AutoConfig
            self.hf_config = AutoConfig.from_pretrained(self.model)
        if self.hf_overrides:
            for k, v in self.hf_overrides.items():
                setattr(self.hf_config, k, v)
        derived_max = getattr(self.text_config, "max_position_embeddings",
                              2048)
        if self.max_model_len is None:
            self.max_model_len = derived_max
        elif self.max_model_len > derived_max:
            # Mirrors the reference's relaxed max-len policy
            # (platform.py:92-97): allow exceeding the HF-derived limit with a
            # warning instead of failing.
            logger.warning(
                "max_model_len %d exceeds the model's "
                "max_position_embeddings %d", self.max_model_len, derived_max)

    @property
    def architecture(self) -> str:
        archs = getattr(self.hf_config, "architectures", None) or []
        return archs[0] if archs else self.hf_config.model_type

    @property
    def text_config(self):
        """The text decoder's config — composite configs (Llama-4 class
        multimodal) nest it under ``text_config``."""
        return getattr(self.hf_config, "text_config", None) or self.hf_config

    @property
    def hidden_size(self) -> int:
        return self.text_config.hidden_size

    @property
    def num_layers(self) -> int:
        return self.text_config.num_hidden_layers

    @property
    def num_heads(self) -> int:
        return self.text_config.num_attention_heads

    @property
    def num_kv_heads(self) -> int:
        return getattr(self.text_config, "num_key_value_heads",
                       self.num_heads) or self.num_heads

    @property
    def head_dim(self) -> int:
        hd = getattr(self.text_config, "head_dim", None)
        return hd if hd else self.hidden_size // self.num_heads

    @property
    def vocab_size(self) -> int:
        return self.text_config.vocab_size

    def stable_hash_dict(self) -> dict:
        return {
            "model": os.path.abspath(self.model),
            "dtype": str(jnp.dtype(self.dtype)),
            "max_model_len": self.max_model_len,
            "hf": self.hf_config.to_json_string(),
        }


@dataclass
class CacheConfig:
    """Paged block-KV cache configuration."""

    block_size: Optional[int] = None  # tokens per KV block
    num_blocks: Optional[int] = None  # total blocks; derived if None
    enable_prefix_caching: bool = False
    kv_cache_dtype: Any = "auto"  # "auto" => model dtype; "fp8" later

    def finalize(self, model_config: ModelConfig,
                 scheduler_config: "SchedulerConfig") -> None:
        if self.block_size is None:
            # Contiguous-KV fallback when prefix caching is off
            # (reference: platform.py:203-207); paged default otherwise.
            self.block_size = (32 if self.enable_prefix_caching else
                               model_config.max_model_len)
        if self.enable_prefix_caching and \
                self.block_size >= model_config.max_model_len:
            raise ValueError(
                "prefix caching requires a paged layout: block_size "
                f"({self.block_size}) must be < max_model_len "
                f"({model_config.max_model_len})")
        min_blocks = self.min_required_blocks(model_config, scheduler_config)
        if self.num_blocks is None:
            self.num_blocks = min_blocks
        elif self.num_blocks < min_blocks:
            # The reference hard-rejects this (model_loader.py:834-867); we
            # allow explicit overcommit — the scheduler preempts under
            # pressure — but flag it.
            logger.warning(
                "num_blocks=%d is below the no-preemption bound "
                "ceil(max_model_len/block_size)*max_num_seqs = %d; requests "
                "may be preempted under load", self.num_blocks, min_blocks)
        if self.num_blocks < cdiv(model_config.max_model_len,
                                  self.block_size):
            raise ValueError(
                f"num_blocks={self.num_blocks} cannot hold even one "
                f"max-length sequence")

    def min_required_blocks(self, model_config: ModelConfig,
                            scheduler_config: "SchedulerConfig") -> int:
        # reference: model_loader.py:741-745 (pa_num_blocks default).
        return (cdiv(model_config.max_model_len, self.block_size) *
                scheduler_config.max_num_seqs)

    @property
    def blocks_per_seq(self) -> int:
        raise AttributeError("use KVCacheSpec.max_blocks_per_seq")


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler policy knobs."""

    max_num_seqs: int = 32  # reference default: platform.py:196-201
    max_num_batched_tokens: int = 131072  # reference: platform.py:188
    # Prompts admitted per prefill step. The reference pins this to 1
    # (core/scheduler.py:116) because its compiled graph takes one prompt;
    # here each prompt is its own bucketed program and the dispatches
    # pipeline with a single device round-trip, so batching admissions is a
    # pure throughput win.
    max_prompt_batch_size: int = 8
    # Same-bucket prompts admitted in one step fuse into ONE ragged prefill
    # program of G*bucket tokens (G a power of two up to this cap).
    # Host-sampling / image-bearing / speculative prompts dispatch singly.
    # Default OFF: measured on-chip (round 4), the fused program runs ~27%
    # slower per step than the same prompts as back-to-back single-prompt
    # dispatches (330 vs 261 ms per 8 prompts — prefill is compute-bound
    # and the pipelined singles already hide dispatch cost); kept for
    # platforms where per-program overhead dominates.
    prefill_group_size: int = 1
    # Allocate a request's EXPECTED final length (prompt + max_tokens) in
    # one grab at admission so its KV pages form one ascending pool run:
    # physically-consecutive pages stream near the sequential HBM rate and
    # the decode kernel's contiguous-chunk DMA collapses a chunk's page
    # copies into one (together ~1.2 ms/step at b80, and growing with
    # context; ops/decode_attention.py + docs/PERF_NOTES.md round-5
    # correction). Purely a layout preference: under pool pressure
    # admission falls back to prompt-only allocation, and preemption
    # semantics are unchanged.
    reserve_full_sequence: bool = True
    enable_chunked_prefill: bool = False
    chunk_size: int = 2048  # tokens per chunked-prefill step
    # Decode steps fused into one device dispatch (token feedback stays on
    # device; the host syncs once per window). Tokens generated past a stop
    # condition inside a window are discarded by the scheduler. 1 disables.
    decode_window: int = 8
    # TTFT policy: when requests are WAITING and admission could plausibly
    # unblock soon (free batch slots, or a running request within a window
    # of its token budget), decode windows shorten to this so the prefill
    # slips in within ~2 steps instead of a full window (VERDICT-r3 #7:
    # windows gate admissions). Full windows are kept when the batch is
    # saturated with no predictable finish (throughput path).
    decode_window_when_waiting: int = 2
    # Optimistic cross-window pipelining: dispatch window w+1 (device-resident
    # token carry, arithmetic continuation) BEFORE fetching window w, so the
    # device never idles on the host round trip. Mispredictions (a request
    # stopped/finished/preempted, or a prefill intervened) discard the
    # speculative window; correctness is unaffected because its KV writes
    # land strictly above every accepted position and are rewritten by the
    # real window. Default ON since the round-4 A/B: +5.7% decode-phase on
    # the 8B INT8 b64 bench (2116 vs 2001 tok/s; docs/PERF_NOTES.md round-4
    # table) — the earlier loss (1178 -> 1022) predated vectorized input
    # prep and the fused window dispatch.
    async_decode: bool = True

    def finalize(self, model_config: ModelConfig) -> None:
        if self.max_num_batched_tokens < model_config.max_model_len and \
                not self.enable_chunked_prefill:
            logger.warning(
                "max_num_batched_tokens (%d) < max_model_len (%d); long "
                "prompts will be rejected", self.max_num_batched_tokens,
                model_config.max_model_len)


@dataclass
class ParallelConfig:
    """Device-mesh parallelism. TP shards weights/KV-heads over the ``model``
    mesh axis (ICI); DP is an outer replica axis (reference analogue: NxDI
    tp_degree inside the compiled graph, model_loader.py:752-753)."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    sequence_parallel: bool = False
    expert_parallel_size: int = 1
    devices: Any = None  # explicit jax devices; default = jax.devices()

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.expert_parallel_size)


@dataclass
class BucketingConfig:
    """Static-shape bucketing to bound XLA recompiles (reference analogue:
    NxDI enable_bucketing / context_encoding_buckets / token_generation_buckets,
    model_loader.py:762-763, README.md:79-81)."""

    enable_bucketing: bool = True
    # Prefill (context-encoding) sequence-length buckets; derived if None.
    context_encoding_buckets: Optional[list[int]] = None
    # Decode (token-generation) batch-size buckets; derived if None.
    token_generation_buckets: Optional[list[int]] = None
    # Context-page buckets (pages gathered per sequence in the dense
    # attention paths); derived from the cache geometry if None.
    page_buckets: Optional[list[int]] = None
    min_bucket: int = 128

    def finalize(self, model_config: ModelConfig,
                 scheduler_config: SchedulerConfig) -> None:
        max_len = model_config.max_model_len
        if self.context_encoding_buckets is None:
            buckets = []
            b = min(self.min_bucket, max_len)
            while b < max_len:
                buckets.append(b)
                b *= 2
            buckets.append(max_len)
            self.context_encoding_buckets = buckets
        else:
            self.context_encoding_buckets = sorted(
                set(self.context_encoding_buckets))
            if self.context_encoding_buckets[-1] < max_len:
                self.context_encoding_buckets.append(max_len)
        if self.token_generation_buckets is None:
            self.token_generation_buckets = [scheduler_config.max_num_seqs]
        else:
            self.token_generation_buckets = sorted(
                set(self.token_generation_buckets))
            if self.token_generation_buckets[-1] < scheduler_config.max_num_seqs:
                self.token_generation_buckets.append(
                    scheduler_config.max_num_seqs)
        if not self.enable_bucketing:
            self.context_encoding_buckets = [max_len]
            self.token_generation_buckets = [scheduler_config.max_num_seqs]

    def finalize_pages(self, max_blocks_per_seq: int) -> None:
        if self.page_buckets is None:
            # Quarter-octave spacing: the dense attention gathers a whole
            # page bucket per row, so coarse (2x) buckets over-read up to
            # 2x of the live context (measured -21% throughput on the 8B
            # bench); ~1.25x spacing caps the waste at ~25% for ~4 programs
            # per octave.
            buckets = set()
            b = min(4, max_blocks_per_seq)
            while b < max_blocks_per_seq:
                buckets.add(b)
                b += max(4, b // 4)
            buckets.add(max_blocks_per_seq)
            self.page_buckets = sorted(buckets)
        else:
            self.page_buckets = sorted(set(self.page_buckets))
            if self.page_buckets[-1] < max_blocks_per_seq:
                self.page_buckets.append(max_blocks_per_seq)
        if not self.enable_bucketing:
            self.page_buckets = [max_blocks_per_seq]

    def page_bucket(self, num_pages: int) -> int:
        for b in self.page_buckets:
            if num_pages <= b:
                return b
        raise ValueError(f"{num_pages} pages exceed the largest page bucket")

    def prefill_bucket(self, num_tokens: int) -> int:
        for b in self.context_encoding_buckets:
            if num_tokens <= b:
                return b
        raise ValueError(
            f"prompt of {num_tokens} tokens exceeds the largest context "
            f"bucket {self.context_encoding_buckets[-1]}")

    def decode_bucket(self, num_seqs: int) -> int:
        for b in self.token_generation_buckets:
            if num_seqs <= b:
                return b
        raise ValueError(f"{num_seqs} seqs exceeds the largest decode bucket")

    @property
    def token_buckets(self) -> list[int]:
        """Buckets for the unified ragged step's padded token count N:
        token-generation buckets serve decode steps (N = #seqs), context
        buckets serve prefill/chunked steps (N = total new tokens)."""
        return sorted(set(self.token_generation_buckets) |
                      set(self.context_encoding_buckets))

    def token_bucket(self, num_tokens: int) -> int:
        for b in self.token_buckets:
            if num_tokens <= b:
                return b
        raise ValueError(
            f"{num_tokens} scheduled tokens exceed the largest bucket "
            f"{self.token_buckets[-1]}")


@dataclass
class SpeculativeConfig:
    """Eagle-V1 fused speculative decoding (reference:
    model_loader.py:243-303, :786-792)."""

    model: Optional[str] = None  # draft model path
    num_speculative_tokens: int = 0
    method: str = "eagle"
    # Fused ROUNDS per host round trip: W>1 runs W draft/verify/accept
    # rounds inside ONE device program with device-resident acceptance
    # state (positions, kv lens, slot math). On hardware with a large
    # host<->device RTT (tunneled v5e: 20-55 ms) single-round speculation
    # pays one RTT per ~1.65 tokens while plain decode windows amortize 8
    # steps per RTT — W-round fusion restores the amortization
    # (docs/PERF_NOTES.md "speculation on the TPU").
    num_fused_rounds: int = 1

    @property
    def enabled(self) -> bool:
        return self.num_speculative_tokens > 0 and self.model is not None


@dataclass
class LoRAConfig:
    """Multi-LoRA serving. The reference exposes this surface but raises
    NotImplementedError at runtime (neuron_worker.py:123-138 — SURVEY.md V9);
    here it is implemented (lora_loader.py, ops/lora.py). Adapters are
    registered at engine build time so the stacked-weight program shape is
    static."""

    # {adapter_name: PEFT checkpoint dir}.
    adapters: dict = field(default_factory=dict)

    @property
    def enabled(self) -> bool:
        return bool(self.adapters)

    def resolve(self, lora) -> int:
        """Adapter name (str / LoRARequest / None) -> group id. Group ids
        are 1 + insertion order, matching lora_loader.LoRAAdapterSet."""
        if lora is None:
            return 0
        name = getattr(lora, "lora_name", None) or str(lora)
        names = list(self.adapters)
        if name not in names:
            raise KeyError(f"unknown LoRA adapter {name!r}; registered: "
                           f"{names}")
        return 1 + names.index(name)


@dataclass
class QuantConfig:
    """INT8/FP8 quantization (reference: model_loader.py:886-898)."""

    quantization: Optional[str] = None  # "int8" | "fp8" | "int4" | None
    quantization_type: str = "per_channel_symmetric"
    # INT4 is grouped (per-group scales along K): the TPU decode path is
    # weight-HBM-bound, so int4 halves the per-step floor again below the
    # reference's int8/fp8 surface. Group size along the input dim.
    int4_group_size: int = 128
    # Opt-in int8 per-channel lm_head (common convention keeps the head
    # high-precision; at 8B the bf16 head is ~1 GB of decode HBM traffic
    # per step). The per-channel scale applies post-dot so logits stay
    # f32-accumulated.
    quantize_lm_head: bool = False
    kv_cache_quant: bool = False
    # W8A8: programs with >= this many token rows quantize activations
    # per-token (symmetric int8) and run s8xs8 on the MXU at 2x the bf16
    # rate — prefill matmuls 44.8 -> 27.6 ms/512 tokens on 8B (docs/
    # PERF_NOTES.md). 0 disables (decode stays on the dequant path either
    # way). Requires quantization="int8". Default 256 (prefill-sized
    # programs only): accuracy validated at −0.0001 ppl vs BF16 on the
    # trained tiny checkpoint (docs/ACCURACY.md), well inside the ≤0.05
    # north star.
    w8a8_min_rows: int = 256
    modules_to_not_convert: list[str] = field(default_factory=list)

    @property
    def enabled(self) -> bool:
        return self.quantization is not None


@dataclass
class SamplerConfig:
    """On-device vs host sampling policy (reference: OnDeviceSamplingConfig,
    model_loader.py:731-732; env NEURON_ON_DEVICE_SAMPLING_DISABLED :67-68)."""

    on_device_sampling: bool = True
    dynamic: bool = True  # per-request params tensor
    global_top_k: int = 256


@dataclass
class ObservabilityConfig:
    collect_step_metrics: bool = True
    profile_dir: Optional[str] = None


@dataclass
class EngineConfig:
    """The full engine configuration tree."""

    model: ModelConfig = None
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    bucketing: BucketingConfig = field(default_factory=BucketingConfig)
    speculative: SpeculativeConfig = field(default_factory=SpeculativeConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    observability: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)
    # AOT-compiled executable cache dir (reference analogue: md5-keyed
    # neuron-compiled-artifacts dir, model_loader.py:180-212). Overridable via
    # $TPU_COMPILED_ARTIFACTS.
    compiled_artifacts_dir: Optional[str] = None

    def __post_init__(self):
        if self.model is None:
            raise ValueError("EngineConfig requires a ModelConfig")
        self.scheduler.finalize(self.model)
        self.cache.finalize(self.model, self.scheduler)
        self.bucketing.finalize(self.model, self.scheduler)
        self.bucketing.finalize_pages(
            cdiv(self.model.max_model_len, self.cache.block_size))
        if self.compiled_artifacts_dir is None:
            self.compiled_artifacts_dir = os.environ.get(
                "TPU_COMPILED_ARTIFACTS")
        self._validate()

    def _validate(self):
        tp = self.parallel.tensor_parallel_size
        if self.model.num_kv_heads % tp != 0 and tp % self.model.num_kv_heads != 0:
            raise ValueError(
                f"num_kv_heads ({self.model.num_kv_heads}) must divide or be "
                f"divisible by tensor_parallel_size ({tp})")
        if self.parallel.sequence_parallel:
            # reference: test/tiny/test_sequence_parallel.py divisibility rule.
            for b in self.bucketing.context_encoding_buckets:
                if b % tp != 0:
                    raise ValueError(
                        f"sequence parallelism requires every context bucket "
                        f"({b}) to be divisible by the TP group size ({tp})")
        ep = self.parallel.expert_parallel_size
        if ep > 1:
            n_exp = (getattr(self.model.hf_config, "num_experts", None) or
                     getattr(self.model.hf_config, "num_local_experts", None))
            if not n_exp:
                raise ValueError(
                    "expert_parallel_size > 1 requires an MoE model (the "
                    "hf config declares no experts)")
            if n_exp % ep != 0:
                raise ValueError(
                    f"num_experts ({n_exp}) must be divisible by "
                    f"expert_parallel_size ({ep})")
        if self.speculative.enabled and self.scheduler.enable_chunked_prefill:
            raise ValueError(
                "speculative decoding is not supported with chunked prefill "
                "(the Eagle draft stream cannot span prefill chunks yet)")
        if self.speculative.enabled and \
                self.speculative.num_fused_rounds < 1:
            raise ValueError(
                f"num_fused_rounds must be >= 1, got "
                f"{self.speculative.num_fused_rounds} (a 0/negative value "
                "would zero the scheduler window and silently disable "
                "speculation)")
        # LoRA composes with speculation: adapter ids ride the target's
        # prefill/verify metas (the Eagle draft stays base-model — stale
        # drafts lower acceptance, the adapted verify stays authoritative).
        if (self.speculative.enabled and self.model.architecture
                == "MllamaForConditionalGeneration"):
            raise ValueError(
                "speculative decoding is not supported for gated "
                "cross-attention families (the fused spec programs do not "
                "thread the cross-KV cache)")
        # Speculation composes with prefix caching: draft KV shares the
        # target's block table (draft position p uses target position p's
        # slot), so cached blocks carry the draft KV written when they were
        # first filled. Blocks whose original request bypassed speculation
        # hold stale draft KV — that only lowers acceptance (verify is
        # authoritative), never correctness.

    def config_hash(self) -> str:
        """Stable hash for the compiled-artifact cache key (reference
        analogue: md5(config.to_json_string()), model_loader.py:180-183)."""
        payload = {
            "model": self.model.stable_hash_dict(),
            "cache": {
                "block_size": self.cache.block_size,
                "num_blocks": self.cache.num_blocks,
                "kv_dtype": str(self.cache.kv_cache_dtype),
            },
            "scheduler": asdict(self.scheduler),
            "parallel": {
                "tp": self.parallel.tensor_parallel_size,
                "dp": self.parallel.data_parallel_size,
                "sp": self.parallel.sequence_parallel,
                "ep": self.parallel.expert_parallel_size,
            },
            "buckets": {
                "ce": self.bucketing.context_encoding_buckets,
                "tg": self.bucketing.token_generation_buckets,
            },
            "spec": asdict(self.speculative),
            "quant": asdict(self.quant),
            "lora": sorted(self.lora.adapters),
        }
        return hashlib.md5(
            json.dumps(payload, sort_keys=True).encode()).hexdigest()
