# SPDX-License-Identifier: Apache-2.0
"""Llama-4 text decoder (Scout / Maverick class).

TPU-native rebuild of the reference's Llama-4 support (reference:
NeuronLlama4ForCausalLM, vllm_neuron/worker/neuronx_distributed_model_loader
.py:559-609; Trn2 MoE blockwise config at test_offline_e2e.py:50-105).

Architecture deltas vs Llama-3 handled here (matching HF
``transformers.models.llama4.modeling_llama4`` semantics):
- interleaved-pair RoPE (complex convention), skipped on "nope" layers
  (``no_rope_layers[i] == 0``);
- attention temperature tuning on nope layers
  (``log1p(floor((pos+1)/floor_scale)) * attn_scale + 1``);
- optional weightless L2 q/k norm on rope layers (``use_qk_norm``);
- chunked local attention on rope layers (``attention_chunk_size``), global
  attention on nope layers;
- MoE layers (``moe_layers``) with sigmoid-scored input-scaled experts
  (fused gate_up [E, H, 2I]) plus an always-on shared expert; remaining
  layers are dense SwiGLU with ``intermediate_size_mlp``.

Layers are heterogeneous, so the decoder is an unrolled per-layer loop over
a list of param dicts rather than a stacked ``lax.scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import ModelConfig
from vllm_neuron_tpu.models.weights import iter_safetensors, transpose
from vllm_neuron_tpu.ops.moe import moe_mlp_llama4
from vllm_neuron_tpu.ops.norm import rms_norm
from vllm_neuron_tpu.ops.quant import linear
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                  ragged_attention,
                                                  write_kv_pages)
from vllm_neuron_tpu.ops.rope import compute_inv_freq
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


def _interleaved_rope(q: jax.Array, k: jax.Array, positions: jax.Array,
                      inv_freq: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Llama-4 rope: adjacent element pairs rotated as complex numbers
    (HF apply_rotary_emb with view_as_complex)."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., D/2]
    cos = jnp.cos(angles)[..., None, :]
    sin = jnp.sin(angles)[..., None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x_even = xf[..., 0::2]
        x_odd = xf[..., 1::2]
        out_even = x_even * cos - x_odd * sin
        out_odd = x_even * sin + x_odd * cos
        return jnp.stack([out_even, out_odd],
                         axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def _l2_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)


class Llama4ForCausalLM:
    """Functional Llama-4 text model; params are a list of per-layer dicts
    plus top-level tensors."""

    def __init__(self, model_config: ModelConfig, quant_config=None):
        hf = model_config.hf_config
        cfg = hf.text_config if hasattr(hf, "text_config") else hf
        self.cfg = cfg
        self.dtype = model_config.dtype
        self.num_layers = cfg.num_hidden_layers
        self.hidden_size = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = getattr(cfg, "num_key_value_heads",
                                    self.num_heads)
        self.head_dim = getattr(cfg, "head_dim",
                                self.hidden_size // self.num_heads)
        self.vocab_size = cfg.vocab_size
        self.rms_eps = getattr(cfg, "rms_norm_eps", 1e-5)
        self.scale = self.head_dim**-0.5
        self.inv_freq = compute_inv_freq(
            self.head_dim, getattr(cfg, "rope_theta", 500000.0),
            getattr(cfg, "rope_scaling", None))
        self.moe_layers = set(getattr(cfg, "moe_layers", []) or [])
        self.top_k = getattr(cfg, "num_experts_per_tok", 1)
        self.num_experts = getattr(cfg, "num_local_experts", 0)
        self.use_rope = [bool(v) for v in cfg.no_rope_layers]  # 1 => rope
        self.use_qk_norm = bool(getattr(cfg, "use_qk_norm", False))
        self.attn_temperature_tuning = bool(
            getattr(cfg, "attn_temperature_tuning", False))
        self.floor_scale = float(getattr(cfg, "floor_scale", 8192.0))
        self.attn_scale = float(getattr(cfg, "attn_scale", 0.1))
        self.attention_chunk_size = getattr(cfg, "attention_chunk_size",
                                            None)
        self.tie_embeddings = getattr(cfg, "tie_word_embeddings", False)
        self.sliding_window = None
        # Sequence parallelism (see LlamaForCausalLM.sp_sharding).
        self.sp_sharding = None
        # Expert parallelism (see LlamaForCausalLM.ep_mesh).
        self.ep_mesh = None
        # Weight quantization: dense projections + shared expert follow
        # the llama-family policy (int4 grouped eligible); routed expert
        # stacks quantize per-channel int8/fp8 with scales applied inside
        # the grouped matmul (ops/moe.py). Reference quant surface:
        # model_loader.py:886-898.
        self.quant = quant_config if (quant_config is not None
                                      and quant_config.enabled) else None

    DENSE_QUANTIZABLE = ("wq", "wk", "wv", "wo", "wg", "wu", "wd",
                         "shared_wg", "shared_wu", "shared_wd")
    EXPERT_QUANTIZABLE = ("gate_up", "down")

    def _quantize_layers(self, layers: list[dict]) -> None:
        from vllm_neuron_tpu.ops.quant import quantize_projections
        for lp in layers:
            quantize_projections(lp, self.DENSE_QUANTIZABLE, self.quant,
                                 expert_names=self.EXPERT_QUANTIZABLE)

    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        np_dtype = np.dtype(jnp.dtype(self.dtype))
        tensors: dict[str, np.ndarray] = {}
        for name, t in iter_safetensors(model_dir):
            for pre in ("language_model.model.", "language_model.",
                        "model.", ""):
                if name.startswith(pre + "layers.") or name in (
                        pre + "embed_tokens.weight", pre + "norm.weight",
                        pre + "lm_head.weight"):
                    tensors[name[len(pre):]] = t
                    break
            else:
                if name == "lm_head.weight":
                    tensors[name] = t

        def get(name, tf=None):
            t = tensors[name].astype(np_dtype)
            return tf(t) if tf else t

        layers = []
        for i in range(self.num_layers):
            L = f"layers.{i}."
            lp: dict[str, Any] = {
                "attn_norm": get(L + "input_layernorm.weight"),
                "mlp_norm": get(L + "post_attention_layernorm.weight"),
                "wq": get(L + "self_attn.q_proj.weight", transpose),
                "wk": get(L + "self_attn.k_proj.weight", transpose),
                "wv": get(L + "self_attn.v_proj.weight", transpose),
                "wo": get(L + "self_attn.o_proj.weight", transpose),
            }
            if i in self.moe_layers:
                F = L + "feed_forward."
                lp["router"] = get(F + "router.weight", transpose)
                lp["gate_up"] = get(F + "experts.gate_up_proj")
                lp["down"] = get(F + "experts.down_proj")
                lp["shared_wg"] = get(F + "shared_expert.gate_proj.weight",
                                      transpose)
                lp["shared_wu"] = get(F + "shared_expert.up_proj.weight",
                                      transpose)
                lp["shared_wd"] = get(F + "shared_expert.down_proj.weight",
                                      transpose)
            else:
                F = L + "feed_forward."
                lp["wg"] = get(F + "gate_proj.weight", transpose)
                lp["wu"] = get(F + "up_proj.weight", transpose)
                lp["wd"] = get(F + "down_proj.weight", transpose)
            layers.append(lp)
        params = {
            "embed": get("embed_tokens.weight"),
            "final_norm": get("norm.weight"),
            "layers": layers,
        }
        if self.tie_embeddings:
            params["lm_head"] = np.ascontiguousarray(params["embed"].T)
        else:
            params["lm_head"] = get("lm_head.weight", transpose)
        self._quantize_layers(layers)
        from vllm_neuron_tpu.models.llama import LlamaForCausalLM
        LlamaForCausalLM._quantize_lm_head(self, params)
        return jax.tree.map(jnp.asarray, params)

    def random_params(self, rng: jax.Array, scale: float = 0.02) -> dict:
        H, D = self.hidden_size, self.head_dim
        nH, nKV = self.num_heads, self.num_kv_heads
        I = self.cfg.intermediate_size
        Im = getattr(self.cfg, "intermediate_size_mlp", I)
        E = self.num_experts
        key = [rng]

        def w(shape):
            key[0], sub = jax.random.split(key[0])
            return (jax.random.normal(sub, shape, jnp.float32) *
                    scale).astype(self.dtype)

        layers = []
        for i in range(self.num_layers):
            lp = {
                "attn_norm": jnp.ones((H,), self.dtype),
                "mlp_norm": jnp.ones((H,), self.dtype),
                "wq": w((H, nH * D)),
                "wk": w((H, nKV * D)),
                "wv": w((H, nKV * D)),
                "wo": w((nH * D, H)),
            }
            if i in self.moe_layers:
                lp.update({
                    "router": w((H, E)),
                    "gate_up": w((E, H, 2 * I)),
                    "down": w((E, I, H)),
                    "shared_wg": w((H, I)),
                    "shared_wu": w((H, I)),
                    "shared_wd": w((I, H)),
                })
            else:
                lp.update({"wg": w((H, Im)), "wu": w((H, Im)),
                           "wd": w((Im, H))})
            layers.append(lp)
        # Tiny shapes only (tests/dryrun): quantize host-side like
        # load_params.
        self._quantize_layers(layers)
        return jax.tree.map(jnp.asarray, {
            "embed": w((self.vocab_size, H)),
            "final_norm": jnp.ones((H,), self.dtype),
            "lm_head": w((H, self.vocab_size)),
            "layers": layers,
        })

    # ------------------------------------------------------------------

    def forward(self, params: dict, input_ids: jax.Array,
                positions: jax.Array, kv_pages: jax.Array, meta: RaggedMeta,
                *, kind: str = "mixed", attn_backend: Optional[str] = None,
                embeds_override: Optional[tuple] = None
                ) -> tuple[jax.Array, jax.Array]:
        N = input_ids.shape[0]
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        L, pages, page_size, combined, Dp = kv_pages.shape
        from vllm_neuron_tpu.parallel.sharding import sp_constraint
        _sp = sp_constraint(self.sp_sharding, N)
        x = params["embed"][input_ids]
        if embeds_override is not None:
            # Multimodal: image-token rows carry projected vision features
            # (reference analogue: vision-mask embedding merge,
            # model_loader.py:596-601).
            override, override_mask = embeds_override
            x = jnp.where(override_mask[:, None], override.astype(x.dtype),
                          x)
        kv_flat = kv_pages.reshape(L * pages, page_size, combined, Dp)
        valid = meta.slot_mapping >= 0
        x = _sp(x)

        for l, lp in enumerate(params["layers"]):
            h = rms_norm(x, lp["attn_norm"], self.rms_eps)
            q = linear(h, lp, "wq").reshape(N, nH, D)
            k = linear(h, lp, "wk").reshape(N, nKV, D)
            v = linear(h, lp, "wv").reshape(N, nKV, D)
            use_rope = self.use_rope[l]
            if use_rope:
                q, k = _interleaved_rope(q, k, positions, self.inv_freq)
                if self.use_qk_norm:
                    q = _l2_norm(q)
                    k = _l2_norm(k)
            elif self.attn_temperature_tuning:
                attn_scales = (
                    jnp.log1p(jnp.floor(
                        (positions.astype(jnp.float32) + 1.0) /
                        self.floor_scale)) * self.attn_scale + 1.0)
                q = (q.astype(jnp.float32) *
                     attn_scales[:, None, None]).astype(q.dtype)
            slots_l = jnp.where(
                valid, meta.slot_mapping + l * (pages * page_size), -1)
            kv_flat = write_kv_pages(kv_flat, k, v, slots_l)
            meta_l = dataclasses.replace(
                meta, slot_mapping=slots_l,
                page_indices=meta.page_indices + l * pages)
            chunk = self.attention_chunk_size if use_rope else None
            attn = ragged_attention(q, kv_flat, meta_l, self.scale,
                                    self.sliding_window, kind=kind,
                                    backend=attn_backend, chunk_size=chunk)
            x = x + linear(attn.reshape(N, nH * D), lp, "wo")
            h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
            if "router" in lp:
                scales = None
                if "gate_up_scale" in lp:
                    scales = (lp["gate_up_scale"], lp["down_scale"])
                routed = moe_mlp_llama4(h, lp["router"], lp["gate_up"],
                                        lp["down"], self.top_k,
                                        ep_mesh=self.ep_mesh,
                                        scales=scales)
                shared = linear(jax.nn.silu(linear(h, lp, "shared_wg")) *
                                linear(h, lp, "shared_wu"), lp, "shared_wd")
                x = x + shared + routed
            else:
                x = x + linear(jax.nn.silu(linear(h, lp, "wg")) *
                               linear(h, lp, "wu"), lp, "wd")
        return x, kv_flat.reshape(L, pages, page_size, combined, Dp)

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        h = rms_norm(hidden, params["final_norm"], self.rms_eps)
        scale = params.get("lm_head_scale")
        if scale is not None:
            return jnp.dot(h, params["lm_head"].astype(h.dtype),
                           preferred_element_type=jnp.float32) * scale
        return jnp.dot(h, params["lm_head"],
                       preferred_element_type=jnp.float32)
