# SPDX-License-Identifier: Apache-2.0
"""Llama-family decoder (Llama 2 / 3.x, Qwen 2.5, Qwen 3 dense) in pure JAX.

TPU-native equivalent of the reference stack's NxDI llama/qwen model graphs
(reference resolves architectures to NxDI classes at
vllm_neuron/worker/neuronx_distributed_model_loader.py:634-659). Design:

- Layer-stacked params + ``lax.scan`` over layers: one compiled while-loop,
  not L inlined blocks.
- One forward function covers context encoding and token generation; the
  attention-metadata kind (a static argument) selects the attention path.
- All matmuls hit the MXU in the model dtype (bf16 by default) with float32
  softmax/norm accumulation; logits are float32.
- KV is written to the paged cache inside the same jitted program
  (scatter via slot_mapping), so prefill + cache-update is one XLA program.

Architecture deltas handled here:
- Qwen2: QKV biases (``attention_bias``).
- Qwen3: per-head q/k RMSNorm (``q_norm``/``k_norm``).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import ModelConfig
from vllm_neuron_tpu.models.weights import (StackingLoader, iter_safetensors,
                                            transpose)
from vllm_neuron_tpu.ops.attention import (DecodeMeta, PrefillMeta,
                                           paged_decode_attention,
                                           prefill_attention,
                                           prefix_prefill_attention, write_kv)
from vllm_neuron_tpu.ops.norm import rms_norm
from vllm_neuron_tpu.ops.rope import apply_rope, compute_inv_freq
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class LlamaForCausalLM:
    """Functional Llama-family model: holds static hyperparameters; params are
    an explicit pytree threaded through jitted calls."""

    def __init__(self, model_config: ModelConfig):
        cfg = model_config.hf_config
        self.dtype = model_config.dtype
        self.num_layers = model_config.num_layers
        self.hidden_size = model_config.hidden_size
        self.num_heads = model_config.num_heads
        self.num_kv_heads = model_config.num_kv_heads
        self.head_dim = model_config.head_dim
        self.vocab_size = model_config.vocab_size
        self.intermediate_size = cfg.intermediate_size
        self.rms_eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.rope_theta = getattr(cfg, "rope_theta", 10000.0)
        self.rope_scaling = getattr(cfg, "rope_scaling", None)
        self.tie_embeddings = getattr(cfg, "tie_word_embeddings", False)
        self.qkv_bias = bool(getattr(cfg, "attention_bias", False)) or \
            cfg.model_type == "qwen2"
        self.qk_norm = cfg.model_type == "qwen3"
        self.sliding_window = None
        if getattr(cfg, "use_sliding_window", False):
            self.sliding_window = getattr(cfg, "sliding_window", None)
        self.scale = self.head_dim**-0.5
        self.inv_freq = compute_inv_freq(self.head_dim, self.rope_theta,
                                         self.rope_scaling)
        # HF "llama3" rope scaling uses attention_scaling=1.0; "linear" too.
        self.attention_scaling = 1.0

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        """Load an HF-format safetensors checkpoint into the stacked layout."""
        ld = StackingLoader(self.num_layers, self.dtype)
        L = "model.layers.{i}."
        ld.register_layer(L + "input_layernorm.weight", "attn_norm")
        ld.register_layer(L + "post_attention_layernorm.weight", "mlp_norm")
        ld.register_layer(L + "self_attn.q_proj.weight", "wq", transpose)
        ld.register_layer(L + "self_attn.k_proj.weight", "wk", transpose)
        ld.register_layer(L + "self_attn.v_proj.weight", "wv", transpose)
        ld.register_layer(L + "self_attn.o_proj.weight", "wo", transpose)
        ld.register_layer(L + "mlp.gate_proj.weight", "wg", transpose)
        ld.register_layer(L + "mlp.up_proj.weight", "wu", transpose)
        ld.register_layer(L + "mlp.down_proj.weight", "wd", transpose)
        if self.qkv_bias:
            ld.register_layer(L + "self_attn.q_proj.bias", "bq")
            ld.register_layer(L + "self_attn.k_proj.bias", "bk")
            ld.register_layer(L + "self_attn.v_proj.bias", "bv")
        if self.qk_norm:
            ld.register_layer(L + "self_attn.q_norm.weight", "q_norm")
            ld.register_layer(L + "self_attn.k_norm.weight", "k_norm")
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
        if self.tie_embeddings:
            params["lm_head"] = np.ascontiguousarray(params["embed"].T)
        return jax.tree.map(jnp.asarray, params)

    def random_params(self, rng: jax.Array, scale: float = 0.02) -> dict:
        """Random params (bench / dryrun without a checkpoint)."""
        H, D, I, V = (self.hidden_size, self.head_dim,
                      self.intermediate_size, self.vocab_size)
        L, nH, nKV = self.num_layers, self.num_heads, self.num_kv_heads
        keys = iter(jax.random.split(rng, 16))

        def w(shape):
            return (jax.random.normal(next(keys), shape, jnp.float32) *
                    scale).astype(self.dtype)

        layers = {
            "attn_norm": jnp.ones((L, H), self.dtype),
            "mlp_norm": jnp.ones((L, H), self.dtype),
            "wq": w((L, H, nH * D)),
            "wk": w((L, H, nKV * D)),
            "wv": w((L, H, nKV * D)),
            "wo": w((L, nH * D, H)),
            "wg": w((L, H, I)),
            "wu": w((L, H, I)),
            "wd": w((L, I, H)),
        }
        if self.qkv_bias:
            layers["bq"] = jnp.zeros((L, nH * D), self.dtype)
            layers["bk"] = jnp.zeros((L, nKV * D), self.dtype)
            layers["bv"] = jnp.zeros((L, nKV * D), self.dtype)
        if self.qk_norm:
            layers["q_norm"] = jnp.ones((L, D), self.dtype)
            layers["k_norm"] = jnp.ones((L, D), self.dtype)
        return {
            "embed": w((V, H)),
            "final_norm": jnp.ones((H,), self.dtype),
            "lm_head": w((H, V)),
            "layers": layers,
        }

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------

    def _attention(self, q, k, v, k_cache, v_cache, meta, kind: str,
                   block_size: int):
        if kind == "prefill":
            return prefill_attention(q, k, v, meta.seq_lens, self.scale,
                                     self.sliding_window)
        if kind == "prefix_prefill":
            return prefix_prefill_attention(q, k, v, k_cache, v_cache, meta,
                                            self.scale, block_size,
                                            self.sliding_window)
        if kind == "decode":
            return paged_decode_attention(q, k_cache, v_cache, meta,
                                          self.scale, block_size,
                                          self.sliding_window)
        raise ValueError(f"unknown attention kind {kind!r}")

    def forward(self, params: dict, input_ids: jax.Array,
                positions: jax.Array, kv_cache: dict, meta, *, kind: str,
                block_size: int) -> tuple[jax.Array, dict]:
        """Run the decoder. input_ids/positions: [B, T].

        Returns (hidden [B, T, H], updated kv_cache). kv_cache is
        {'k': [L, num_slots, Hkv, D], 'v': ...} and is updated in-place via
        donation at the jit boundary.
        """
        B, T = input_ids.shape
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        x = params["embed"][input_ids]  # [B, T, H]
        slot_mapping = meta.slot_mapping.reshape(-1)

        def layer(x, xs):
            lp, k_cache_l, v_cache_l = xs
            h = rms_norm(x, lp["attn_norm"], self.rms_eps)
            q = h @ lp["wq"]
            k = h @ lp["wk"]
            v = h @ lp["wv"]
            if self.qkv_bias:
                q = q + lp["bq"]
                k = k + lp["bk"]
                v = v + lp["bv"]
            q = q.reshape(B, T, nH, D)
            k = k.reshape(B, T, nKV, D)
            v = v.reshape(B, T, nKV, D)
            if self.qk_norm:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
            q, k = apply_rope(q, k, positions, self.inv_freq,
                              self.attention_scaling)
            k_cache_l, v_cache_l = write_kv(k_cache_l, v_cache_l,
                                            k.reshape(B * T, nKV, D),
                                            v.reshape(B * T, nKV, D),
                                            slot_mapping)
            attn = self._attention(q, k, v, k_cache_l, v_cache_l, meta, kind,
                                   block_size)
            x = x + attn.reshape(B, T, nH * D) @ lp["wo"]
            h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
            gate = jax.nn.silu(h @ lp["wg"])
            x = x + (gate * (h @ lp["wu"])) @ lp["wd"]
            return x, (k_cache_l, v_cache_l)

        x, (k_new, v_new) = jax.lax.scan(
            layer, x, (params["layers"], kv_cache["k"], kv_cache["v"]))
        return x, {"k": k_new, "v": v_new}

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        """hidden: [N, H] -> logits [N, V] float32."""
        h = rms_norm(hidden, params["final_norm"], self.rms_eps)
        return jnp.dot(h, params["lm_head"],
                       preferred_element_type=jnp.float32)
