# SPDX-License-Identifier: Apache-2.0
"""Eagle-V1 draft model (fused speculative decoding).

TPU-native rebuild of the reference's fused Eagle speculation (NxDI
``enable_fused_speculation`` / ``enable_eagle_speculation``; config cloning
at vllm_neuron/worker/neuronx_distributed_model_loader.py:243-303; draft
checkpoints repaired with the target's lm_head at
test/utils/eagle_nxdi_util.py — here the target's lm_head is simply used
in-program, no checkpoint surgery).

Eagle-1 structure: the draft consumes, per position i, the concatenation of
``embed(token_{i+1})`` and the target's hidden feature ``f_i``, projects it
through ``fc`` ([2H] -> [H]), runs ONE Llama decoder layer over the (shifted
by -1) position stream, and predicts token ``t_{i+2}`` via the target's
lm_head on its output feature. During multi-token drafting the draft feeds
its own output features forward.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import ModelConfig
from vllm_neuron_tpu.models.weights import (StackingLoader, iter_safetensors,
                                            transpose)
from vllm_neuron_tpu.ops.norm import rms_norm
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                  ragged_attention,
                                                  write_kv_pages)
from vllm_neuron_tpu.ops.rope import apply_rope, compute_inv_freq
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class EagleDraft:
    """Functional Eagle draft: fc + a stack of Llama decoder layers (usually
    one). Hyperparameters default to the target's (reference clones the
    target NeuronConfig the same way, model_loader.py:243-303)."""

    def __init__(self, target_config: ModelConfig, draft_hf_config):
        cfg = draft_hf_config
        self.dtype = target_config.dtype
        self.num_layers = getattr(cfg, "num_hidden_layers", 1)
        self.hidden_size = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = getattr(cfg, "num_key_value_heads",
                                    self.num_heads) or self.num_heads
        hd = getattr(cfg, "head_dim", None)
        self.head_dim = hd if hd else self.hidden_size // self.num_heads
        self.intermediate_size = cfg.intermediate_size
        self.rms_eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.rope_theta = getattr(cfg, "rope_theta", 10000.0)
        self.scale = self.head_dim**-0.5
        self.inv_freq = compute_inv_freq(self.head_dim, self.rope_theta,
                                         getattr(cfg, "rope_scaling", None))
        self.qkv_bias = bool(getattr(cfg, "attention_bias", False))

    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        ld = StackingLoader(self.num_layers, self.dtype)
        for prefix in ("model.layers.{i}.", "layers.{i}."):
            L = prefix
            ld.register_layer(L + "input_layernorm.weight", "attn_norm")
            ld.register_layer(L + "post_attention_layernorm.weight",
                              "mlp_norm")
            ld.register_layer(L + "self_attn.q_proj.weight", "wq", transpose)
            ld.register_layer(L + "self_attn.k_proj.weight", "wk", transpose)
            ld.register_layer(L + "self_attn.v_proj.weight", "wv", transpose)
            ld.register_layer(L + "self_attn.o_proj.weight", "wo", transpose)
            ld.register_layer(L + "mlp.gate_proj.weight", "wg", transpose)
            ld.register_layer(L + "mlp.up_proj.weight", "wu", transpose)
            ld.register_layer(L + "mlp.down_proj.weight", "wd", transpose)
        for name in ("fc.weight", "model.fc.weight"):
            ld.register(name, "fc", transpose)
        for name in ("fc.bias", "model.fc.bias"):
            ld.register(name, "fc_bias")
        ld.register("embed_tokens.weight", "embed")
        ld.register("model.embed_tokens.weight", "embed")
        unused = []
        for name, tensor in iter_safetensors(model_dir):
            if not ld.consume(name, tensor):
                unused.append(name)
        if unused:
            logger.info("eagle draft: ignored tensors %s", unused[:4])
        params = ld.finalize(allow_missing={"embed", "fc_bias"})
        return jax.tree.map(jnp.asarray, params)

    def random_params(self, rng: jax.Array, scale: float = 0.02) -> dict:
        H, D, I = self.hidden_size, self.head_dim, self.intermediate_size
        L, nH, nKV = self.num_layers, self.num_heads, self.num_kv_heads
        keys = iter(jax.random.split(rng, 12))

        def w(shape):
            return (jax.random.normal(next(keys), shape, jnp.float32) *
                    scale).astype(self.dtype)

        return {
            "fc": w((2 * H, H)),
            "layers": {
                "attn_norm": jnp.ones((L, H), self.dtype),
                "mlp_norm": jnp.ones((L, H), self.dtype),
                "wq": w((L, H, nH * D)),
                "wk": w((L, H, nKV * D)),
                "wv": w((L, H, nKV * D)),
                "wo": w((L, nH * D, H)),
                "wg": w((L, H, I)),
                "wu": w((L, H, I)),
                "wd": w((L, I, H)),
            },
        }

    # ------------------------------------------------------------------

    def forward(self, params: dict, embed_fn, token_ids: jax.Array,
                features: jax.Array, positions: jax.Array,
                kv_pages: jax.Array, meta: RaggedMeta, *, kind: str,
                attn_backend: Optional[str] = None
                ) -> tuple[jax.Array, jax.Array]:
        """Draft forward over a ragged stream.

        token_ids: [N] (tokens t_{i+1}); features: [N, H] (target or draft
        features f_i); positions: [N] DRAFT positions (target position - 1).
        Returns (features_out [N, H], kv_pages). The caller turns features
        into draft logits via the TARGET's lm_head.
        """
        N = token_ids.shape[0]
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        L = self.num_layers
        pages_total, page_size, combined, Dp = kv_pages.shape[1:]
        emb = embed_fn(token_ids) if params.get("embed") is None else \
            params["embed"][token_ids]
        x = jnp.concatenate([emb.astype(self.dtype),
                             features.astype(self.dtype)], axis=-1)
        x = x @ params["fc"]
        if params.get("fc_bias") is not None:
            x = x + params["fc_bias"]
        kv_flat = kv_pages.reshape(L * pages_total, page_size, combined, Dp)
        valid = meta.slot_mapping >= 0
        import dataclasses

        def layer(carry, xs):
            x, kv_flat = carry
            lp, l = xs
            h = rms_norm(x, lp["attn_norm"], self.rms_eps)
            q = (h @ lp["wq"]).reshape(N, nH, D)
            k = (h @ lp["wk"]).reshape(N, nKV, D)
            v = (h @ lp["wv"]).reshape(N, nKV, D)
            q, k = apply_rope(q, k, positions, self.inv_freq)
            slots_l = jnp.where(
                valid, meta.slot_mapping + l * (pages_total * page_size), -1)
            kv_flat = write_kv_pages(kv_flat, k, v, slots_l)
            meta_l = dataclasses.replace(
                meta, slot_mapping=slots_l,
                page_indices=meta.page_indices + l * pages_total)
            attn = ragged_attention(q, kv_flat, meta_l, self.scale,
                                    kind=kind, backend=attn_backend)
            x = x + attn.reshape(N, nH * D) @ lp["wo"]
            h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
            x = x + (jax.nn.silu(h @ lp["wg"]) * (h @ lp["wu"])) @ lp["wd"]
            return (x, kv_flat), None

        (x, kv_flat), _ = jax.lax.scan(
            layer, (x, kv_flat),
            (params["layers"], jnp.arange(L, dtype=jnp.int32)))
        return x, kv_flat.reshape(L, pages_total, page_size, combined, Dp)
