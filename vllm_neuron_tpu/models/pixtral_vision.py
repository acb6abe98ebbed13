# SPDX-License-Identifier: Apache-2.0
"""Pixtral vision tower (Mistral ViT with 2-D RoPE) + Llava projector.

The reference *gates Pixtral off* ("Pixtral is not yet supported",
vllm_neuron/worker/neuronx_distributed_model_loader.py:511-556, raise at
:672-674) — this is a working implementation, i.e. the "beat" half of
match-or-beat. Functional port of HF ``PixtralVisionModel``:

conv patchify (no CLS, no learned positions) -> RMSNorm ``ln_pre`` ->
transformer layers (RMSNorm pre-norms, bias-free q/k/v/o with 2-D rotary
embeddings, gated-SiLU MLP) -> ``vision_feature_layer`` tap -> Llava
``multi_modal_projector`` (linear/GELU/linear) into the text hidden size.

2-D RoPE: each patch at grid position (r, c) gets frequency vector
``concat(outer(r, freqs[0::2]), outer(c, freqs[1::2]))`` duplicated over
the two rotary halves — HF's ``PixtralRotaryEmbedding`` table indexed at
``r * max_patches_per_side + c``, computed here directly from the grid.

Images in one call share a shape ``[B, C, H, W]``; batching the attention
over B is exactly HF's packed block-diagonal mask (patches never attend
across images). Variable-size batches dispatch one call per distinct size
(each jit-specializes on the grid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.models.weights import iter_safetensors, transpose
from vllm_neuron_tpu.ops.norm import rms_norm
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class PixtralVisionEncoder:
    """Functional Pixtral ViT; weights from the composite Llava checkpoint's
    ``vision_tower.*`` + ``multi_modal_projector.*`` tensors."""

    merge = "embeds"  # runner merges projected features at [IMG] rows

    def __init__(self, hf_config, dtype):
        vc = hf_config.vision_config
        self.dtype = dtype
        self.num_layers = vc.num_hidden_layers
        self.hidden_size = vc.hidden_size
        self.num_heads = vc.num_attention_heads
        self.head_dim = getattr(vc, "head_dim", None) or \
            self.hidden_size // self.num_heads
        self.patch_size = vc.patch_size
        self.image_size = vc.image_size
        self.num_channels = getattr(vc, "num_channels", 3)
        self.rope_theta = getattr(vc, "rope_theta", 10000.0)
        self.norm_eps = 1e-5  # hardcoded in HF PixtralAttentionLayer
        self.scale = self.head_dim**-0.5
        # hidden_states index to tap: 0 = post-ln_pre embeddings, i = after
        # layer i (HF convention). Pixtral checkpoints use -1 ("full").
        fl = getattr(hf_config, "vision_feature_layer", -1)
        self.feature_layer = fl if fl >= 0 else self.num_layers + 1 + fl
        self.drop_first = getattr(hf_config, "vision_feature_select_strategy",
                                  "full") == "default"

    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        np_dtype = np.dtype(jnp.dtype(self.dtype))
        tensors: dict[str, np.ndarray] = {}
        for name, t in iter_safetensors(model_dir):
            for pre in ("model.", ""):
                for stem in ("vision_tower.", "multi_modal_projector."):
                    if name.startswith(pre + stem):
                        tensors[name[len(pre):]] = t

        def get(name, tf=None):
            if name not in tensors:
                raise KeyError(f"missing vision tensor {name}")
            t = tensors[name].astype(np_dtype)
            return tf(t) if tf else t

        V = "vision_tower."
        layers = []
        for i in range(self.num_layers):
            L = f"{V}transformer.layers.{i}."
            layers.append({
                "attn_norm": get(L + "attention_norm.weight"),
                "ffn_norm": get(L + "ffn_norm.weight"),
                "wq": get(L + "attention.q_proj.weight", transpose),
                "wk": get(L + "attention.k_proj.weight", transpose),
                "wv": get(L + "attention.v_proj.weight", transpose),
                "wo": get(L + "attention.o_proj.weight", transpose),
                "gate": get(L + "feed_forward.gate_proj.weight", transpose),
                "up": get(L + "feed_forward.up_proj.weight", transpose),
                "down": get(L + "feed_forward.down_proj.weight", transpose),
            })
        # Conv2d patch kernel [H, C, p, p] -> matmul form [C*p*p, H] with
        # channel-major patch pixels (matches the unfold layout below).
        patch = tensors[V + "patch_conv.weight"]
        patch = patch.reshape(patch.shape[0], -1).T.astype(np_dtype)
        params = {
            "patch_w": patch,
            "ln_pre_w": get(V + "ln_pre.weight"),
            "proj1_w": get("multi_modal_projector.linear_1.weight",
                           transpose),
            "proj2_w": get("multi_modal_projector.linear_2.weight",
                           transpose),
            "layers": layers,
        }
        for pk, hk in (("proj1_b", "multi_modal_projector.linear_1.bias"),
                       ("proj2_b", "multi_modal_projector.linear_2.bias")):
            if hk in tensors:  # multimodal_projector_bias=True checkpoints
                params[pk] = get(hk)
        return jax.tree.map(jnp.asarray, params)

    # ------------------------------------------------------------------

    def _rope(self, gh: int, gw: int):
        """cos/sin [gh*gw, head_dim] for the raster-order patch grid —
        HF PixtralRotaryEmbedding's table rows at r*max_side + c."""
        D = self.head_dim
        freqs = 1.0 / (self.rope_theta ** (np.arange(0, D, 2) / D))
        fh = np.outer(np.arange(gh), freqs[0::2])  # [gh, D/4]
        fw = np.outer(np.arange(gw), freqs[1::2])  # [gw, D/4]
        half = np.concatenate([
            np.broadcast_to(fh[:, None, :], (gh, gw, fh.shape[1])),
            np.broadcast_to(fw[None, :, :], (gh, gw, fw.shape[1])),
        ], axis=-1).reshape(gh * gw, D // 2)
        full = np.concatenate([half, half], axis=-1)  # [P, D]
        return (jnp.asarray(np.cos(full), self.dtype),
                jnp.asarray(np.sin(full), self.dtype))

    @staticmethod
    def _rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    def forward(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [B, C, H, W] (all images one size; H, W multiples
        of patch_size). Returns projected features [B, gh*gw, text_hidden]
        in raster order — the runner places them at the [IMG] token rows."""
        B, _, H, W = pixel_values.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        P = gh * gw
        x = pixel_values.reshape(B, self.num_channels, gh, p, gw, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # [B, gh, gw, C, p, p]
        x = x.reshape(B, P, self.num_channels * p * p)
        x = x.astype(self.dtype) @ params["patch_w"]  # [B, P, hidden]
        x = rms_norm(x, params["ln_pre_w"], self.norm_eps)

        cos, sin = self._rope(gh, gw)  # [P, D]
        nH, D = self.num_heads, self.head_dim
        feats = x if self.feature_layer == 0 else None
        for li, lp in enumerate(params["layers"]):
            h = rms_norm(x, lp["attn_norm"], self.norm_eps)
            q = (h @ lp["wq"]).reshape(B, P, nH, D)
            k = (h @ lp["wk"]).reshape(B, P, nH, D)
            v = (h @ lp["wv"]).reshape(B, P, nH, D)
            c, s = cos[None, :, None, :], sin[None, :, None, :]
            q = q * c + self._rotate_half(q) * s
            k = k * c + self._rotate_half(k) * s
            scores = jnp.einsum("bphd,bqhd->bhpq", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores * self.scale, axis=-1)
            attn = jnp.einsum("bhpq,bqhd->bphd", probs.astype(v.dtype), v)
            x = x + attn.reshape(B, P, nH * D) @ lp["wo"]
            h = rms_norm(x, lp["ffn_norm"], self.norm_eps)
            x = x + (jax.nn.silu(h @ lp["gate"]) * (h @ lp["up"])) \
                @ lp["down"]
            if li + 1 == self.feature_layer:
                feats = x
        assert feats is not None, "vision_feature_layer out of range"
        if self.drop_first:
            feats = feats[:, 1:]
        h = feats @ params["proj1_w"]
        if "proj1_b" in params:
            h = h + params["proj1_b"]
        out = jax.nn.gelu(h, approximate=False) @ params["proj2_w"]
        if "proj2_b" in params:
            out = out + params["proj2_b"]
        return out
