# SPDX-License-Identifier: Apache-2.0
"""Model runner: translates SchedulerOutput into the unified ragged step's
device tensors and drives the bucketed programs.

TPU-native rebuild of the reference's NeuronxDistributedModelRunner
(vllm_neuron/worker/neuronx_distributed_model_runner.py:72): persistent
InputBatch sync (:381-510) and input prep — but where the reference needs
four separate preparation paths (continuous-batching prefill :681-737,
prefix-caching variants :739-832, decode :765-796, chunked prefill
:938-1051), the ragged layout needs ONE: every scheduled request contributes
``num_scheduled_tokens`` new tokens to a flat [N] stream, whatever phase it
is in. All per-token loops are vectorized in numpy; each step is a single
jitted device call.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from vllm_neuron_tpu.config import EngineConfig
from vllm_neuron_tpu.core.sched_output import (ModelRunnerOutput,
                                               SchedulerOutput)
from vllm_neuron_tpu.models.registry import get_model
from vllm_neuron_tpu.sampling.cpu_sampler import (RequestSamplerState,
                                                  sample_token)
from vllm_neuron_tpu.utils import cdiv, init_logger
from vllm_neuron_tpu.worker.executor import ModelExecutor
from vllm_neuron_tpu.worker.input_batch import InputBatch

logger = init_logger(__name__)


class ModelRunner:

    def __init__(self, config: EngineConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.block_size = config.cache.block_size
        self.max_blocks_per_seq = cdiv(config.model.max_model_len,
                                       self.block_size)
        self.max_num_seqs = config.scheduler.max_num_seqs
        self.input_batch = InputBatch(
            max_num_seqs=config.scheduler.max_num_seqs,
            max_blocks_per_seq=self.max_blocks_per_seq,
            block_size=self.block_size,
        )
        self.model = None
        self.executor: Optional[ModelExecutor] = None
        # Multi-LoRA adapter registry (lora_loader.py); set in load_model.
        self.lora_set = None
        self._sampler_states: dict[str, RequestSamplerState] = {}
        # Host sampling for everything (debug / oracle) when disabled.
        self.on_device_sampling = config.sampler.on_device_sampling
        # Optimistic cross-window pipelining state: the already-dispatched
        # next decode window, keyed by its assumptions.
        self.async_decode = config.scheduler.async_decode
        self._inflight: Optional[dict] = None

    # ------------------------------------------------------------------

    def load_model(self, params: Optional[dict] = None) -> None:
        self.model = get_model(self.config)
        if (self.config.parallel.sequence_parallel
                and self.mesh is not None):
            from vllm_neuron_tpu.parallel.sharding import sp_sharding_for
            self.model.sp_sharding = sp_sharding_for(self.mesh)
        if self.mesh is not None:
            from vllm_neuron_tpu.parallel.mesh import EXPERT_AXIS
            if self.mesh.shape.get(EXPERT_AXIS, 1) > 1:
                self.model.ep_mesh = self.mesh
        presharded = False
        if params is None:
            if self.config.model.load_format == "random":
                import jax
                params = self.model.random_params(
                    jax.random.PRNGKey(self.config.model.seed))
            elif self._use_sharded_load():
                from vllm_neuron_tpu.models.sharded_weights import (
                    load_llama_sharded, load_prequantized_sharded)
                # Pre-quantized checkpoints (tools/quantize.py) take the
                # lazy quantized-shard path — the 70B-class fp8 recipe:
                # quantize once, every host range-reads only its shards.
                params = load_prequantized_sharded(
                    self.model, self.config.model.model, self.mesh)
                if params is None:
                    params = load_llama_sharded(self.model,
                                                self.config.model.model,
                                                self.mesh)
                presharded = True
            else:
                from vllm_neuron_tpu.tools.quantize import load_prequantized
                params = load_prequantized(self.config.model.model)
                if params is None:
                    params = self.model.load_params(self.config.model.model)
        if self.config.lora.enabled:
            from vllm_neuron_tpu.lora_loader import LoRAAdapterSet
            self.lora_set = LoRAAdapterSet(self.model,
                                           self.config.lora.adapters,
                                           self.config.model.dtype)
            lora_params = self.lora_set.params
            if presharded:
                from vllm_neuron_tpu.parallel.sharding import replicate_tree
                lora_params = replicate_tree(lora_params, self.mesh)
            params["lora"] = lora_params
        self.executor = ModelExecutor(self.model, self.config, params,
                                      mesh=self.mesh, presharded=presharded)
        # Vision tower for multimodal models (reference analogue: separate
        # vision_neuron_config graph, model_loader.py:421-440).
        self.vision = None
        self.vision_params = None
        self.image_token_index = getattr(self.config.model.hf_config,
                                         "image_token_index", None)
        from vllm_neuron_tpu.models.registry import VISION_REGISTRY
        vision_builder = VISION_REGISTRY.get(self.config.model.architecture)
        if (vision_builder is not None
                and self.config.model.load_format != "random"):
            import jax

            self.vision = vision_builder(self.config.model.hf_config,
                                         self.config.model.dtype)
            self.vision_params = self.vision.load_params(
                self.config.model.model)
            self._vision_fwd = jax.jit(self.vision.forward)
            if getattr(self.vision, "merge", "embeds") == "cross":
                # Gated cross-attention family (Mllama): allocate the
                # per-row encoder-KV cache sized for one image's worth of
                # vision tokens (tiles x patches).
                self.executor.init_cross_attention(
                    self.vision.max_num_tiles * self.vision.num_patches)
        spec = self.config.speculative
        if spec.enabled:
            import jax

            from transformers import AutoConfig

            from vllm_neuron_tpu.models.eagle import EagleDraft
            if self.config.model.load_format == "random":
                import copy
                draft_hf = copy.deepcopy(self.config.model.hf_config)
                draft_hf.num_hidden_layers = 1
            else:
                draft_hf = AutoConfig.from_pretrained(spec.model)
            draft = EagleDraft(self.config.model, draft_hf)
            if self.config.model.load_format == "random":
                dparams = draft.random_params(jax.random.PRNGKey(1))
            else:
                dparams = draft.load_params(spec.model)
            self.executor.init_speculation(draft, dparams)
        # Speculation acceptance counters (surfaced via engine /metrics;
        # reference analogue: vLLM spec-decode acceptance-rate metrics the
        # plugin inherits through the fused-spec output contract,
        # model_loader.py:308-334).
        self.spec_stats = {"rounds": 0, "drafted": 0, "accepted": 0}

    def _use_sharded_load(self) -> bool:
        """Lazy per-host sharded loading (models/sharded_weights.py): on for
        multi-host serving (full host-side tensors would not fit nor be
        needed), opt-in via VLLM_TPU_SHARDED_LOAD=1 on one host. Covers the
        dense Llama/Qwen stacked layout. Quantized serving shard-loads only
        PRE-quantized checkpoints (tools/quantize.py — the 70B fp8 recipe);
        quantize-on-LOAD is excluded, as per-channel scales need full input
        columns."""
        import os

        from vllm_neuron_tpu.models.llama import LlamaForCausalLM
        from vllm_neuron_tpu.parallel import multihost
        if self.mesh is None or type(self.model) is not LlamaForCausalLM:
            return False
        if self.config.quant.enabled:
            from vllm_neuron_tpu.tools.quantize import MANIFEST
            prequant = os.path.exists(
                os.path.join(self.config.model.model, MANIFEST))
            if multihost.num_hosts() > 1 and not prequant:
                raise NotImplementedError(
                    "multi-host + quantize-on-load is unsupported: "
                    "pre-quantize the checkpoint with tools/quantize.py")
            if not prequant:
                return False
        return (multihost.num_hosts() > 1
                or os.environ.get("VLLM_TPU_SHARDED_LOAD") == "1")

    def warmup(self) -> None:
        mm = (self.vision is not None
              and getattr(self.vision, "merge", "embeds") != "cross")
        self.executor.warmup(mm=mm)
        if mm and hasattr(self.vision, "image_size"):
            # Pre-compile the vision encoder at the canonical one-image
            # pixel shape — the first image request otherwise pays the
            # ViT compile at serve time (multi-image requests still
            # compile their n_images variant on first sight).
            import jax
            s = self.vision.image_size
            jax.block_until_ready(self._vision_fwd(
                self.vision_params, np.zeros((1, 3, s, s), np.float32)))
        elif (self.vision is not None
              and getattr(self.vision, "merge", "embeds") == "cross"
              and hasattr(self.vision, "image_size")):
            # Gated cross-attention family (Mllama): one image at the
            # FULL tile count — the HF processor pads tiles, so this is
            # the canonical serve shape (_set_cross_row).
            import jax
            s = self.vision.image_size
            T = getattr(self.vision, "max_num_tiles", 1)
            jax.block_until_ready(self._vision_fwd(
                self.vision_params,
                np.zeros((1, 1, T, 3, s, s), np.float32),
                np.zeros((1, 1), np.int32),
                np.ones((1, 1, T), np.int32)))

    # ------------------------------------------------------------------
    # Persistent-batch sync (reference: _update_states, :381-510)
    # ------------------------------------------------------------------

    def _update_states(self, so: SchedulerOutput) -> None:
        for req_id in so.finished_req_ids:
            self.input_batch.remove_request(req_id)
            self._sampler_states.pop(req_id, None)
        for new in so.scheduled_new_reqs:
            self.input_batch.add_request(
                req_id=new.req_id,
                prompt_token_ids=new.prompt_token_ids,
                sampling_params=new.sampling_params,
                num_computed_tokens=new.num_computed_tokens,
                block_ids=list(new.block_ids),
                mm_inputs=new.mm_inputs,
                lora_int_id=new.lora_int_id,
            )
            self._sampler_states[new.req_id] = RequestSamplerState(
                new.sampling_params, new.prompt_token_ids)
        for new in so.scheduled_new_reqs:
            state = self.input_batch.requests[new.req_id]
            self.input_batch.needs_host[state.row] = self._needs_host(state)
        cached = so.scheduled_cached_reqs
        for i, req_id in enumerate(cached.req_ids):
            state = self.input_batch.requests[req_id]
            self.input_batch.append_block_ids(req_id,
                                              cached.new_block_ids[i])
            state.num_computed_tokens = cached.num_computed_tokens[i]
            self.input_batch.num_computed[state.row] = \
                cached.num_computed_tokens[i]

    # ------------------------------------------------------------------
    # Execution (unified ragged step)
    # ------------------------------------------------------------------

    def _slot_mapping_for_range(self, block_ids: list[int], start: int,
                                end: int) -> np.ndarray:
        """Flat KV slots for token positions [start, end)."""
        pos = np.arange(start, end, dtype=np.int64)
        bt = np.asarray(block_ids, dtype=np.int64)
        return (bt[pos // self.block_size] * self.block_size +
                pos % self.block_size).astype(np.int32)

    def execute_model(self, so: SchedulerOutput) -> ModelRunnerOutput:
        # The ops layer reads the attention mesh from thread-local state at
        # trace time; concurrent DP engine lanes step from different threads,
        # so each lane re-registers its own mesh every step (cheap).
        from vllm_neuron_tpu.ops.ragged_attention import set_attention_mesh
        set_attention_mesh(self.mesh)
        self._update_states(so)
        if so.total_num_scheduled_tokens == 0:
            return ModelRunnerOutput()

        # Ragged order: new requests first, then cached — the order the
        # scheduler emitted them.
        items: list[tuple[str, int]] = [
            (new.req_id, so.num_scheduled_tokens[new.req_id])
            for new in so.scheduled_new_reqs
        ]
        items += [(req_id, so.num_scheduled_tokens[req_id])
                  for req_id in so.scheduled_cached_reqs.req_ids]
        assert len(items) <= self.max_num_seqs, \
            "scheduler overcommitted the seq budget"

        # Static step-kind split: prompt-processing items run one prefill
        # program each (the scheduler admits at most max_prompt_batch_size
        # per step); pure decode items batch into one decode program.
        ib = self.input_batch
        prefill_items: list[tuple[str, int]] = []
        decode_items: list[str] = []
        for req_id, num_new in items:
            state = ib.requests[req_id]
            if state.num_computed_tokens < state.num_prompt_tokens:
                prefill_items.append((req_id, num_new))
            else:
                decode_items.append((req_id, num_new))

        results: dict[str, tuple[list[int], object]] = {}
        # Prefills dispatch back-to-back (async); ONE sync covers them all —
        # M prompts cost M device times + 1 round trip, not M round trips.
        # Same-bucket eligible prompts additionally fuse into grouped
        # programs (one dispatch per group; see _form_prefill_groups).
        groups, singles = self._form_prefill_groups(prefill_items)
        gpending = [(group, self._dispatch_prefill_group(group))
                    for group in groups]
        pending = [(req_id, num_new, self._dispatch_prefill(req_id, num_new))
                   for req_id, num_new in singles]
        if pending or gpending:
            import jax
            fetched = jax.device_get(
                [(h[0], h[1]) for _, _, h in pending] +
                [h for _, h in gpending])
            for (req_id, num_new, handle), (toks, logits) in zip(
                    pending, fetched[:len(pending)]):
                results[req_id] = self._finalize_prefill(
                    req_id, num_new, (toks, logits, handle[2]))
            for (group, _), toks in zip(gpending, fetched[len(pending):]):
                for i, (req_id, num_new) in enumerate(group):
                    results[req_id] = self._finalize_prefill(
                        req_id, num_new, (toks[i:i + 1], None, False))
        if decode_items:
            results.update(self._run_decode(decode_items))

        out = ModelRunnerOutput()
        for req_id, _ in items:
            sampled, logprobs = results[req_id]
            idx = len(out.req_ids)
            out.req_ids.append(req_id)
            out.req_id_to_index[req_id] = idx
            out.sampled_token_ids.append(sampled)
            out.logprobs.append(logprobs)
        return out

    # -- per-kind steps --------------------------------------------------

    def _sampling_row(self, state, arrays, i) -> None:
        temperature, top_k, top_p = arrays
        sp = state.sampling_params
        temperature[i] = sp.temperature
        top_k[i] = sp.top_k
        top_p[i] = sp.top_p

    def _needs_host(self, state) -> bool:
        return (not self.on_device_sampling
                or state.sampling_params.needs_host_sampling())

    def _record_token(self, state, tok: int) -> None:
        state.output_token_ids.append(tok)
        self.input_batch.last_tokens[state.row] = tok

    def _groupable_prefills(self) -> bool:
        """Grouped prefill covers the common dense-text device-sampled case;
        speculative, cross-attention (Mllama), and embedding-merge vision
        engines keep per-prompt dispatch (their prefill programs thread
        extra state)."""
        return (self.config.scheduler.prefill_group_size > 1
                and not self.config.speculative.enabled
                and getattr(self.executor, "cross_kv", None) is None
                and self.vision is None)

    def _form_prefill_groups(self, items: list[tuple[str, int]]):
        """Split the step's prefill items into same-bucket groups (power-of-2
        sizes up to prefill_group_size) + singles. Host-sampling and
        image-bearing requests always dispatch singly."""
        if not self._groupable_prefills():
            return [], items
        from vllm_neuron_tpu.ops.ragged_attention import _flash_prefill_min_t
        ib = self.input_batch
        by_bucket: dict[int, list[tuple[str, int]]] = {}
        singles: list[tuple[str, int]] = []
        # Long-context prompts stay single: the grouped program only has
        # the dense-scores attention path ([S*T, C] f32 materialization —
        # the exact cliff the flash CE kernel avoids), while single-seq
        # prefill takes flash at buckets >= this threshold.
        flash_min = _flash_prefill_min_t()
        for req_id, num_new in items:
            state = ib.requests[req_id]
            bucket = self.config.bucketing.token_bucket(num_new)
            if (self._needs_host(state) or state.mm_inputs
                    or bucket >= flash_min):
                singles.append((req_id, num_new))
            else:
                by_bucket.setdefault(bucket, []).append((req_id, num_new))
        groups = []
        # Power-of-2 cap: warmup enumerates power-of-2 group sizes only
        # (config.py's documented invariant); a non-pow2 prefill_group_size
        # would otherwise form group sizes with no precompiled program.
        cap = self.config.scheduler.prefill_group_size
        cap = 1 << (cap.bit_length() - 1)
        for bucket, members in by_bucket.items():
            i = 0
            while len(members) - i >= 2:
                g = min(cap, 1 << (len(members) - i).bit_length() - 1)
                groups.append(members[i:i + g])
                i += g
            singles.extend(members[i:])
        return groups, singles

    def _dispatch_prefill_group(self, group: list[tuple[str, int]]):
        """ONE ragged program for S same-bucket prompts at fixed stride
        b = the shared token bucket (ops/ragged_attention
        _prefill_batch_attention_dense). Returns the device tokens [S]."""
        ib = self.input_batch
        S = len(group)
        b = self.config.bucketing.token_bucket(group[0][1])
        N = S * b
        token_ids = np.zeros(N, np.int32)
        positions = np.zeros(N, np.int32)
        slot_mapping = np.full(N, -1, np.int32)
        kv_lens = np.zeros(S, np.int32)
        cu_q = np.zeros(S + 1, np.int32)
        logits_indices = np.zeros(S, np.int32)
        temperature = np.zeros(S, np.float32)
        top_k = np.full(S, -1, np.int32)
        top_p = np.ones(S, np.float32)
        adapter_ids = (np.zeros(N, np.int32)
                       if self.lora_set is not None else None)
        ends = []
        for i, (req_id, num_new) in enumerate(group):
            state = ib.requests[req_id]
            nct = state.num_computed_tokens
            end = nct + num_new
            ends.append(end)
            o = i * b
            token_ids[o:o + num_new] = state.tokens_range(nct, end)
            positions[o:o + num_new] = np.arange(nct, end)
            slot_mapping[o:o + num_new] = self._slot_mapping_for_range(
                state.block_ids, nct, end)
            kv_lens[i] = end
            cu_q[i + 1] = cu_q[i] + num_new
            logits_indices[i] = o + num_new - 1
            self._sampling_row(state, (temperature, top_k, top_p), i)
            if adapter_ids is not None:
                adapter_ids[o:o + num_new] = state.lora_int_id
        PP = self.config.bucketing.page_bucket(
            cdiv(max(ends), self.block_size))
        page_indices = np.zeros((S, PP), np.int32)
        for i, (req_id, _) in enumerate(group):
            bids = ib.requests[req_id].block_ids
            nb = min(len(bids), PP)
            page_indices[i, :nb] = bids[:nb]
        dev_tokens, _ = self.executor.run_step(
            token_ids, positions, slot_mapping, kv_lens=kv_lens,
            page_indices=page_indices, cu_q_lens=cu_q, num_seqs=S,
            logits_indices=logits_indices, temperature=temperature,
            top_k=top_k, top_p=top_p, return_logits=False, kind="prefill",
            keep_device=True, adapter_ids=adapter_ids)
        return dev_tokens

    def _dispatch_prefill(self, req_id: str, num_new: int):
        """Enqueue one sequence's (possibly partial/chunked, possibly
        prefix-cached) prompt processing; returns device handles."""
        state = self.input_batch.requests[req_id]
        nct = state.num_computed_tokens
        end = nct + num_new
        N = self.config.bucketing.token_bucket(num_new)
        PP = self.config.bucketing.page_bucket(cdiv(end, self.block_size))

        token_ids = np.zeros(N, np.int32)
        token_ids[:num_new] = state.tokens_range(nct, end)
        positions = np.zeros(N, np.int32)
        positions[:num_new] = np.arange(nct, end)
        slot_mapping = np.full(N, -1, np.int32)
        slot_mapping[:num_new] = self._slot_mapping_for_range(
            state.block_ids, nct, end)
        page_indices = np.zeros((1, PP), np.int32)
        nb = min(len(state.block_ids), PP)
        page_indices[0, :nb] = state.block_ids[:nb]
        temperature = np.zeros(1, np.float32)
        top_k = np.full(1, -1, np.int32)
        top_p = np.ones(1, np.float32)
        self._sampling_row(state, (temperature, top_k, top_p), 0)
        host = self._needs_host(state)

        mm_kwargs = {}
        if getattr(self.executor, "cross_kv", None) is not None:
            # Gated cross-attention family (Mllama): cache this row's
            # cross K/V once per request (first dispatch — chunked
            # continuations and prefix-cache-hit windows reuse it), and
            # thread the row map through every program so text-only rows
            # in mixed batches mask to the exact skip-layers result.
            if not getattr(state, "cross_ready", False):
                if state.mm_inputs:
                    self._set_cross_row(state)
                else:
                    self.executor.clear_cross_row(state.row)
                state.cross_ready = True
            mm_kwargs["cross_rows"] = np.full(N, state.row, np.int32)
        elif self.vision is not None and state.mm_inputs and \
                getattr(self.vision, "merge", "embeds") == "cross":
            raise ValueError(
                "Mllama image inputs require the cross-KV cache "
                "(unavailable with load_format='random')")
        if self.vision is not None and state.mm_inputs and \
                getattr(self.vision, "merge", "embeds") != "cross" and \
                self.image_token_index is not None:
            chunk_tokens = np.asarray(token_ids[:num_new])
            img_rows = np.nonzero(
                chunk_tokens == self.image_token_index)[0]
            if img_rows.size:
                pixel_values = np.asarray(state.mm_inputs["pixel_values"],
                                          np.float32)
                feats = np.asarray(
                    self._vision_fwd(self.vision_params,
                                     pixel_values))  # [T, P, H]
                feats = feats.reshape(-1, feats.shape[-1])
                # Image rows map to vision features in order; with chunked
                # prefill, rows before this chunk consumed earlier features.
                prior = sum(1 for t in range(nct)
                            if state.token_at(t) == self.image_token_index)
                override = np.zeros((N, feats.shape[-1]), np.float32)
                mask = np.zeros(N, bool)
                take = feats[prior:prior + img_rows.size]
                override[img_rows[:take.shape[0]]] = take
                mask[img_rows[:take.shape[0]]] = True
                mm_kwargs = {"embeds_override": override,
                             "override_mask": mask}

        adapter_ids = None
        if self.lora_set is not None:
            adapter_ids = np.zeros(N, np.int32)
            adapter_ids[:num_new] = state.lora_int_id

        # nct > 0 here is a prefix-cache hit (chunked prefill is excluded
        # with spec at config time): the cached blocks carry draft KV too,
        # so the draft stream just starts at nct.
        use_spec = self.config.speculative.enabled and not host
        if use_spec:
            dev_tokens = self.executor.run_prefill_spec(
                token_ids, positions, slot_mapping, kv_len=end,
                page_indices=page_indices, num_new=num_new, row=state.row,
                temperature=temperature, top_k=top_k, top_p=top_p,
                keep_device=True, adapter_ids=adapter_ids)
            logits = None
        else:
            dev_tokens, logits = self.executor.run_step(
                token_ids, positions, slot_mapping,
                kv_lens=np.array([end], np.int32),
                page_indices=page_indices,
                cu_q_lens=np.array([0, num_new], np.int32),
                num_seqs=1,
                logits_indices=np.array([num_new - 1], np.int32),
                temperature=temperature, top_k=top_k, top_p=top_p,
                return_logits=host, kind="prefill", keep_device=True,
                adapter_ids=adapter_ids, **mm_kwargs)
        return dev_tokens, logits, host

    def _set_cross_row(self, state) -> None:
        """Run the vision tower and cache the request row's cross K/V
        (Mllama: pixel_values [B, M, T, C, H, W] + aspect_ratio_ids/mask)."""
        mm = state.mm_inputs
        px = np.asarray(mm["pixel_values"], np.float32)
        ar_ids = np.asarray(mm["aspect_ratio_ids"], np.int32)
        ar_mask = np.asarray(mm["aspect_ratio_mask"], np.int32)
        states = np.asarray(self._vision_fwd(
            self.vision_params, px, ar_ids, ar_mask))  # [B, T_img, H]
        states = states.reshape(-1, states.shape[-1])
        T = self.executor.cross_t
        n_valid = min(states.shape[0], T)
        padded = np.zeros((T, states.shape[-1]), states.dtype)
        padded[:n_valid] = states[:n_valid]
        self.executor.set_cross_row(state.row, padded, n_valid)

    def _finalize_prefill(self, req_id: str, num_new: int, handle
                          ) -> tuple[list[int], object]:
        tokens_np, logits_np, host = handle  # already fetched to host
        state = self.input_batch.requests[req_id]
        state.num_computed_tokens += num_new
        if state.num_computed_tokens < state.num_prompt_tokens:
            return [], None  # chunked prefill still in flight
        state.in_prefill = False
        if host:
            result = sample_token(np.asarray(logits_np)[0],
                                  state.sampling_params,
                                  self._sampler_states[req_id])
            tok, logprobs = result.token_id, result.logprobs
        else:
            tok = int(np.asarray(tokens_np)[0])
            logprobs = None
        self._record_token(state, tok)
        return [tok], logprobs

    def _run_decode(self, items: list[tuple[str, int]]
                    ) -> dict[str, tuple[list[int], object]]:
        """Decode for all running sequences. When every request samples on
        device, the scheduler's decode window (K tokens per request) runs as
        ONE fused multi-step dispatch. Host-sampling requests (penalties /
        seeds / logprobs) do NOT collapse the batch (the round-1 behavior,
        flagged against reference model_runner.py:1053-1104): the batch
        splits — device rows keep their K-step window, host rows run one
        single-step program per engine step, overlapped with the in-flight
        window (the scheduler's uniform-advance rule reconciles the
        different advance rates)."""
        ib = self.input_batch
        states = [ib.requests[req_id] for req_id, _ in items]
        host_flags = [self._needs_host(s) for s in states]
        if not any(host_flags):
            # On-device sampling rows (any temperature/top-k/top-p) keep
            # speculating: acceptance is rejection sampling, which both
            # preserves the target distribution and degenerates to exact
            # prefix-match for greedy rows (sampling/spec.py).
            if self.config.speculative.enabled and \
                    max(n for _, n in items) > 1:
                # Fixed K = the configured speculation length, whatever the
                # rows' remaining budgets: ONE compiled spec program per
                # (N, PP) instead of one per residual-K. Rows with fewer
                # scheduled tokens truncate their accepted prefix; slots
                # past block capacity are -1 (KV write skipped), and
                # positions written above an accepted token are rewritten
                # by the round that actually consumes them.
                spec = self.config.speculative
                if spec.num_fused_rounds > 1:
                    # Fixed W every dispatch. A budget-aware ladder
                    # (downshift W when the remaining budget < the window
                    # capacity) was A/B'd on chip and LOST 7% e2e: window
                    # CAPACITY overestimates progress (~1.8 accepted
                    # tokens/round), so tail downshifts added round trips,
                    # and the RTT they cost exceeds the device time a
                    # smaller W saves (docs/PERF_NOTES.md spec sweep).
                    return self._run_spec_multi(
                        items, states, spec.num_speculative_tokens,
                        spec.num_fused_rounds)
                return self._run_spec(
                    items, states, spec.num_speculative_tokens)
            K = max(n for _, n in items)
            if K > 1:
                return self._run_decode_window(items, states, K)
            return self._run_decode_single(items, states)
        dev = [i for i, h in enumerate(host_flags) if not h]
        K_dev = max((items[i][1] for i in dev), default=1)
        if not dev or K_dev == 1:
            # All-host (or windowless) batches: one mixed single step.
            return self._run_decode_single(items, states)
        host = [i for i, h in enumerate(host_flags) if h]
        host_items = [items[i] for i in host]
        host_states = [states[i] for i in host]
        results = self._run_decode_window(
            [items[i] for i in dev], [states[i] for i in dev], K_dev,
            overlap=lambda: self._run_decode_single(host_items,
                                                    host_states))
        return results

    def _run_spec_multi(self, items, states, K: int, W: int
                        ) -> dict[str, tuple[list[int], object]]:
        """W fused speculation rounds per host round trip: acceptance
        state (positions, kv lens, slot math) lives on device
        (executor._build_spec_decode_multi); the host walks the [N, W, T]
        accepted grid round by round and trims to each request's
        scheduled-token budget (same truncation contract as the fixed-K
        single round)."""
        # Page-bucket sizing must cover the FULL multi-round window: the
        # device advances up to W*(K+1) positions in one dispatch, so the
        # bucket request is W*(K+1) tokens past nct (a one-round bucket
        # would let later rounds' page lookups clip into the last listed
        # page and overwrite live context KV).
        (N, token_ids, positions, _, kv_lens, page_indices,
         temperature, top_k, top_p, adapter_ids, _) = self._decode_arrays(
             states, W * (K + 1), skip_slot_table=True)
        row_ids = np.zeros(N, np.int32)
        slot_caps = np.zeros(N, np.int32)
        for i, state in enumerate(states):
            row_ids[i] = state.row
            slot_caps[i] = len(state.block_ids) * self.block_size
        accepted = self.executor.run_spec_decode_multi(
            row_ids, token_ids, positions, slot_caps, kv_lens,
            page_indices, num_seqs=len(states), K=K, W=W,
            temperature=temperature, top_k=top_k, top_p=top_p,
            adapter_ids=adapter_ids)  # [N, W, K+1]
        results = {}
        # The device executes all W rounds for every row regardless of
        # budgets; acceptance-rate accounting counts only rounds whose
        # tokens were (at least partly) consumed, mirroring the
        # single-round bookkeeping (1 bonus + accepted drafts per round).
        self.spec_stats["rounds"] += W
        for i, ((req_id, num_new), state) in enumerate(zip(items, states)):
            toks: list[int] = []
            for r in range(W):
                remaining = num_new - len(toks)
                if remaining <= 0:
                    break
                take = [int(t) for t in accepted[i, r]
                        if t >= 0][:remaining]
                toks.extend(take)
                # Drafted = the round's USABLE draft positions, mirroring
                # the device's slot_caps guard (executor slots_for: draft
                # writes past the row's reserved blocks are skipped) and
                # the single-round dslot_table>=0 accounting — counting a
                # flat K per round skewed acceptance-rate low between the
                # two modes (ADVICE r4).
                # Device drafts at positions pos0-1+j (j<K) with pos0 =
                # kv_len + consumed; usable = min(K, cap - pos0 + 1) —
                # matching the single-round k_req formula exactly.
                pos0 = int(kv_lens[i]) + (len(toks) - len(take))
                self.spec_stats["drafted"] += max(
                    0, min(K, int(slot_caps[i]) - pos0 + 1))
                self.spec_stats["accepted"] += max(0, len(take) - 1)
            state.num_computed_tokens += len(toks)
            for tok in toks:
                self._record_token(state, tok)
            results[req_id] = (toks, None)
        return results

    def _run_spec(self, items, states, K: int
                  ) -> dict[str, tuple[list[int], object]]:
        """One fused Eagle speculation round: schedule gave each request
        1 + K potential tokens; the device returns the accepted prefix."""
        (N, token_ids, positions, slot_table, kv_lens, page_indices,
         temperature, top_k, top_p, adapter_ids, _) = self._decode_arrays(
             states, K + 1)
        # Draft slots: draft position p shares target position p's slot
        # numbering; draft steps cover positions nct-1 .. nct+K-2.
        dslot_table = np.full((K, N), -1, np.int32)
        row_ids = np.zeros(N, np.int32)
        for i, state in enumerate(states):
            nct = state.num_computed_tokens
            cap = len(state.block_ids) * self.block_size
            k_req = min(K, cap - (nct - 1))
            if nct >= 1 and k_req > 0:
                dslot_table[:k_req, i] = self._slot_mapping_for_range(
                    state.block_ids, nct - 1, nct - 1 + k_req)
            row_ids[i] = state.row
        accepted = self.executor.run_spec_decode(
            row_ids, token_ids, positions, slot_table, dslot_table,
            kv_lens, page_indices, num_seqs=len(states),
            temperature=temperature, top_k=top_k, top_p=top_p,
            adapter_ids=adapter_ids)  # [N, K+1]
        results = {}
        self.spec_stats["rounds"] += 1
        for i, ((req_id, num_new), state) in enumerate(zip(items, states)):
            toks = [int(t) for t in accepted[i] if t >= 0][:num_new]
            state.num_computed_tokens += len(toks)
            for tok in toks:
                self._record_token(state, tok)
            # Each row drafted as many tokens as it had valid draft slots;
            # one sampled token per round is the target's own (bonus), the
            # rest are accepted drafts.
            self.spec_stats["drafted"] += int(
                (dslot_table[:, i] >= 0).sum())
            self.spec_stats["accepted"] += max(0, len(toks) - 1)
            results[req_id] = (toks, None)
        return results

    def _decode_arrays(self, states, K: int, nct_offset: int = 0,
                       skip_slot_table: bool = False):
        """Assemble one decode window's host arrays — fully vectorized over
        the InputBatch's dense per-row mirrors (the reference's pure-Python
        per-token input prep, model_runner.py:757-763, is the anti-pattern
        this replaces). ``nct_offset`` shifts the window start (optimistic
        next-window dispatch)."""
        ib = self.input_batch
        bs = self.block_size
        n = len(states)
        N = self.config.bucketing.token_bucket(n)
        rows = np.fromiter((s.row for s in states), np.int32, n)
        nct = ib.num_computed[rows] + nct_offset  # [n]

        token_ids = np.zeros(N, np.int32)
        token_ids[:n] = ib.last_tokens[rows]
        positions = np.zeros(N, np.int32)
        positions[:n] = nct
        kv_lens = np.zeros(N, np.int32)
        kv_lens[:n] = nct + 1

        bt = ib.block_tables[rows]  # [n, P]
        slot_table = None
        if not skip_slot_table:
            pos = nct[None, :] + np.arange(K, dtype=np.int32)[:, None]
            cap = (ib.num_blocks[rows] * bs)[None, :]
            blk = np.minimum(pos // bs, self.max_blocks_per_seq - 1)
            slots = bt[np.arange(n)[None, :], blk] * bs + pos % bs
            slot_table = np.full((K, N), -1, np.int32)
            # Rows clamped by block capacity get -1 (KV write skipped;
            # sampled overshoot discarded by the scheduler).
            slot_table[:, :n] = np.where(pos < cap, slots, -1)

        temperature = np.zeros(N, np.float32)
        top_k = np.full(N, -1, np.int32)
        top_p = np.ones(N, np.float32)
        temperature[:n] = ib.temperature[rows]
        top_k[:n] = ib.top_k[rows]
        top_p[:n] = ib.top_p[rows]

        max_pages = cdiv(int(nct.max()) + K, bs) if n else 1
        PP = self.config.bucketing.page_bucket(
            min(max_pages, self.max_blocks_per_seq))
        page_indices = np.zeros((N, PP), np.int32)
        page_indices[:n] = bt[:, :PP]
        adapter_ids = None
        if self.lora_set is not None:
            adapter_ids = np.zeros(N, np.int32)
            adapter_ids[:n] = ib.adapter_ids[rows]
        cross_rows = None
        if getattr(self.executor, "cross_kv", None) is not None:
            cross_rows = np.zeros(N, np.int32)
            cross_rows[:n] = rows
        return (N, token_ids, positions, slot_table, kv_lens, page_indices,
                temperature, top_k, top_p, adapter_ids, cross_rows)

    def _window_key(self, items, states) -> tuple:
        return (tuple(req_id for req_id, _ in items),
                tuple(int(self.input_batch.num_computed[s.row])
                      for s in states))

    def _dispatch_window(self, items, states, K: int, nct_offset: int,
                         first_tokens) -> dict:
        """Dispatch one K-step window starting nct_offset tokens ahead of
        the current computed counts. first_tokens: host array or device
        carry."""
        (N, token_ids, positions, slot_table, kv_lens, page_indices,
         temperature, top_k, top_p, adapter_ids,
         cross_rows) = self._decode_arrays(states, K, nct_offset)
        handle = self.executor.dispatch_decode_window(
            first_tokens if first_tokens is not None else token_ids,
            positions, slot_table, kv_lens, page_indices,
            num_seqs=len(states), temperature=temperature, top_k=top_k,
            top_p=top_p, adapter_ids=adapter_ids, cross_rows=cross_rows)
        handle["K"] = K
        return handle

    def _run_decode_window(self, items, states, K: int, overlap=None
                           ) -> dict[str, tuple[list[int], object]]:
        """Fetch this step's window — reusing the optimistically dispatched
        one when its assumptions held — and (async mode) dispatch the next
        window before fetching, so the device never idles on the host.
        ``overlap`` (host-sampling split, _run_decode) runs between dispatch
        and fetch — its host syncs ride the window's device time."""
        key = (self._window_key(items, states), K)
        inflight, self._inflight = self._inflight, None
        if inflight is not None and inflight["key"] == key:
            handle = inflight["handle"]
        else:
            # Mispredicted (or no) speculative window: its results are
            # discarded; positions it wrote are strictly above every
            # accepted token and get rewritten by this real window.
            handle = self._dispatch_window(items, states, K,
                                           nct_offset=0, first_tokens=None)
        if self.async_decode:
            # Optimistically dispatch the NEXT window: same rows, computed
            # counts advanced by K, first token carried on device.
            next_key = (tuple(req_id for req_id, _ in items),
                        tuple(int(self.input_batch.num_computed[s.row]) + K
                              for s in states))
            next_handle = self._dispatch_window(
                items, states, K, nct_offset=K,
                first_tokens=handle["last"])
            self._inflight = {"key": (next_key, K), "handle": next_handle}
        extra = overlap() if overlap is not None else None
        all_tokens = self.executor.fetch_decode_window(handle)  # [K, N]
        results = {} if extra is None else extra
        for i, ((req_id, num_new), state) in enumerate(zip(items, states)):
            toks = [int(t) for t in all_tokens[:num_new, i]]
            state.num_computed_tokens += num_new
            for tok in toks:
                self._record_token(state, tok)
            results[req_id] = (toks, None)
        return results

    def _run_decode_single(self, items, states
                           ) -> dict[str, tuple[list[int], object]]:
        (N, token_ids, positions, slot_table, kv_lens, page_indices,
         temperature, top_k, top_p, adapter_ids,
         cross_rows) = self._decode_arrays(states, 1)
        host_rows = [i for i, s in enumerate(states) if self._needs_host(s)]
        logits_rows = None
        if host_rows:
            # Gather host-sampled rows' logits ON DEVICE: a 2-host-row
            # batch ships [H~2, V], not [N, V] (~16 MB at V=128k, b32).
            # H is bucketed (powers of 4, pad repeats the first row) to
            # bound the warmable program-variant count (executor.warmup).
            from vllm_neuron_tpu.worker.executor import host_gather_bucket
            H = host_gather_bucket(len(host_rows), N)
            logits_rows = np.full(H, host_rows[0], np.int32)
            logits_rows[:len(host_rows)] = host_rows
        dev_tokens, logits = self.executor.run_step(
            token_ids, positions, slot_table[0], kv_lens, page_indices,
            cu_q_lens=np.arange(N + 1, dtype=np.int32),
            num_seqs=len(states),
            logits_indices=np.arange(N, dtype=np.int32),
            temperature=temperature, top_k=top_k, top_p=top_p,
            return_logits=bool(host_rows), kind="decode",
            adapter_ids=adapter_ids, cross_rows=cross_rows,
            logits_rows=logits_rows)
        host_slot = {row: j for j, row in enumerate(host_rows)}
        results = {}
        for i, ((req_id, _), state) in enumerate(zip(items, states)):
            state.num_computed_tokens += 1
            if i in host_slot:
                result = sample_token(logits[host_slot[i]],
                                      state.sampling_params,
                                      self._sampler_states[req_id])
                tok, logprobs = result.token_id, result.logprobs
            else:
                tok, logprobs = int(dev_tokens[i]), None
            self._record_token(state, tok)
            results[req_id] = ([tok], logprobs)
        return results
