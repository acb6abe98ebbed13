# SPDX-License-Identifier: Apache-2.0
"""Qwen3-MoE decoder (Qwen3-30B-A3B class).

Same attention stack as dense Qwen3 (per-head q/k RMSNorm, no QKV bias —
handled by the base LlamaForCausalLM via config), with the FFN replaced by a
top-k routed mixture of experts (ops/moe.py). Reference arch mapping:
vllm_neuron/worker/neuronx_distributed_model_loader.py:647-648 (qwen3_moe ->
NxDI blockwise-matmul MoE).

v1 scope: all decoder layers sparse (``decoder_sparse_step == 1`` and empty
``mlp_only_layers`` — true for the shipping Qwen3-MoE checkpoints).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import ModelConfig, QuantConfig
from vllm_neuron_tpu.models.llama import LlamaForCausalLM
from vllm_neuron_tpu.models.weights import (StackingLoader, iter_safetensors,
                                            transpose)
from vllm_neuron_tpu.ops.moe import moe_mlp
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class Qwen3MoeForCausalLM(LlamaForCausalLM):

    def __init__(self, model_config: ModelConfig,
                 quant_config=None):
        super().__init__(model_config, quant_config)
        cfg = model_config.hf_config
        self.num_experts = cfg.num_experts
        self.top_k = cfg.num_experts_per_tok
        self.moe_intermediate_size = cfg.moe_intermediate_size
        self.norm_topk_prob = bool(getattr(cfg, "norm_topk_prob", True))
        sparse_step = getattr(cfg, "decoder_sparse_step", 1)
        mlp_only = getattr(cfg, "mlp_only_layers", []) or []
        if sparse_step != 1 or mlp_only:
            raise NotImplementedError(
                "mixed dense/sparse Qwen3-MoE layers not supported yet")

    # Expert stacks quantize per-channel int8/fp8 AS A UNIT (shared
    # policy: ops/quant.py quantize_projections).
    EXPERT_QUANTIZABLE = ("we_gate", "we_up", "we_down")

    def _quantize_layer_params(self, layers: dict) -> None:
        from vllm_neuron_tpu.ops.quant import quantize_projections
        quantize_projections(layers, self.QUANTIZABLE, self.quant,
                             expert_names=self.EXPERT_QUANTIZABLE)

    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        ld = StackingLoader(self.num_layers, self.dtype)
        L = "model.layers.{i}."
        ld.register_layer(L + "input_layernorm.weight", "attn_norm")
        ld.register_layer(L + "post_attention_layernorm.weight", "mlp_norm")
        ld.register_layer(L + "self_attn.q_proj.weight", "wq", transpose)
        ld.register_layer(L + "self_attn.k_proj.weight", "wk", transpose)
        ld.register_layer(L + "self_attn.v_proj.weight", "wv", transpose)
        ld.register_layer(L + "self_attn.o_proj.weight", "wo", transpose)
        if self.qk_norm:
            ld.register_layer(L + "self_attn.q_norm.weight", "q_norm")
            ld.register_layer(L + "self_attn.k_norm.weight", "k_norm")
        ld.register_layer(L + "mlp.gate.weight", "router", transpose)
        for e in range(self.num_experts):
            E = L + f"mlp.experts.{e}."
            ld.register_layer(E + "gate_proj.weight", f"_we_gate_{e}",
                              transpose)
            ld.register_layer(E + "up_proj.weight", f"_we_up_{e}", transpose)
            ld.register_layer(E + "down_proj.weight", f"_we_down_{e}",
                              transpose)
        ld.register("model.embed_tokens.weight", "embed")
        ld.register("model.norm.weight", "final_norm")
        if not self.tie_embeddings:
            ld.register("lm_head.weight", "lm_head", transpose)
        unused = []
        for name, tensor in iter_safetensors(model_dir):
            if not ld.consume(name, tensor):
                unused.append(name)
        if unused:
            logger.warning("ignored %d checkpoint tensors (e.g. %s)",
                           len(unused), unused[:4])
        params = ld.finalize()
        layers = params["layers"]
        for kind in ("we_gate", "we_up", "we_down"):
            stacked = np.stack(
                [layers.pop(f"_{kind}_{e}") for e in range(self.num_experts)],
                axis=1)  # [L, E, K, N]
            layers[kind] = stacked
        if self.tie_embeddings:
            params["lm_head"] = np.ascontiguousarray(params["embed"].T)
        self._quantize_layer_params(layers)
        self._quantize_lm_head(params)
        return jax.tree.map(jnp.asarray, params)

    def random_params(self, rng: jax.Array, scale: float = 0.02) -> dict:
        params = super().random_params(rng, scale)
        layers = params["layers"]
        for name in ("wg", "wu", "wd"):
            layers.pop(name, None)
        H, Ie = self.hidden_size, self.moe_intermediate_size
        L, E = self.num_layers, self.num_experts
        keys = iter(jax.random.split(jax.random.fold_in(rng, 7), 4))

        def w(shape):
            return (jax.random.normal(next(keys), shape, jnp.float32) *
                    scale).astype(self.dtype)

        layers["router"] = w((L, H, E))
        expert = {"we_gate": w((L, E, H, Ie)), "we_up": w((L, E, H, Ie)),
                  "we_down": w((L, E, Ie, H))}
        if self.quant is not None:
            # Host-side re-quantization (random params serve tests/dryrun
            # at tiny scale; large-scale random MoE isn't a bench config).
            from vllm_neuron_tpu.ops.quant import quantize_projections
            quantize_projections(expert, (), self.quant,
                                 expert_names=self.EXPERT_QUANTIZABLE)
            layers.update({k: jnp.asarray(v) for k, v in expert.items()})
        else:
            layers.update(expert)
        return params

    # ------------------------------------------------------------------

    def _mlp(self, lp: dict, h: jax.Array) -> jax.Array:
        scales = None
        if "we_gate_scale" in lp:
            scales = (lp["we_gate_scale"], lp["we_up_scale"],
                      lp["we_down_scale"])
        return moe_mlp(h, lp["router"], lp["we_gate"], lp["we_up"],
                       lp["we_down"], top_k=self.top_k,
                       norm_topk_prob=self.norm_topk_prob,
                       ep_mesh=self.ep_mesh, scales=scales)
