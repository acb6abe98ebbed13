# SPDX-License-Identifier: Apache-2.0
"""Llama-4 vision tower + projector (multimodal path).

TPU-native equivalent of the reference's separate vision graph (reference:
``vision_neuron_config``, vllm_neuron/worker/neuronx_distributed_model_loader
.py:421-440; image-token merge at :596-601). Faithful port of HF
``Llama4VisionModel`` + ``Llama4MultiModalProjector``:

patchify (unfold+linear) -> [patches, CLS] -> +positional embedding ->
LayerNorm_pre -> ViT layers (bidirectional attention with 2D interleaved
rope, GELU MLP, LayerNorm with bias) -> LayerNorm_post -> drop CLS ->
pixel-shuffle adapter (fc1-gelu-fc2-gelu) -> linear projector into the text
hidden size.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_neuron_tpu.ops.norm import layer_norm
import numpy as np

from vllm_neuron_tpu.models.weights import iter_safetensors, transpose
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


def _vision_rope_tables(image_size: int, patch_size: int, hidden_size: int,
                        num_heads: int, rope_theta: float
                        ) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin tables [P+1, head_dim/2] mirroring HF's
    Llama4VisionRotaryEmbedding (2D coords, CLS row zeroed)."""
    idx = image_size // patch_size
    img_idx = np.arange(idx**2, dtype=np.int32).reshape(idx**2, 1)
    img_idx = np.concatenate([img_idx, img_idx[:1]], axis=0)
    img_idx[-1, -1] = -2  # CLS token
    fx = img_idx % idx
    fy = img_idx // idx
    freq_dim = hidden_size // num_heads // 2
    rope_freq = 1.0 / (rope_theta**(
        np.arange(0, freq_dim, 2)[:freq_dim // 2].astype(np.float64) /
        freq_dim))
    freqs_x = np.repeat((fx + 1)[..., None] * rope_freq[None, None, :], 2,
                        axis=-1)
    freqs_y = np.repeat((fy + 1)[..., None] * rope_freq[None, None, :], 2,
                        axis=-1)
    freqs = np.concatenate([freqs_x, freqs_y], axis=-1)[..., ::2]
    freqs = np.where(img_idx.reshape(-1, 1, 1) < 0, 0.0, freqs)
    freqs = freqs[:, 0, :]  # [P+1, head_dim/2]
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def _rope_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved complex rotation; x: [B, P, H, D], cos/sin: [P, D/2]."""
    xf = x.astype(jnp.float32)
    xe = xf[..., 0::2]
    xo = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out_e = xe * c - xo * s
    out_o = xe * s + xo * c
    return jnp.stack([out_e, out_o], axis=-1).reshape(x.shape).astype(x.dtype)


def _pixel_shuffle(x: jax.Array, ratio: float) -> jax.Array:
    B, P, C = x.shape
    ps = int(math.sqrt(P))
    x = x.reshape(B, ps, ps, -1)
    x = x.reshape(B, ps, int(ps * ratio), int(C / ratio))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(B, int(ps * ratio), int(ps * ratio),
                  int(C / (ratio * ratio)))
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(B, -1, x.shape[-1])


class Llama4VisionEncoder:
    """Functional vision tower; weights from the composite checkpoint's
    ``vision_model.*`` + ``multi_modal_projector.*`` tensors."""

    def __init__(self, hf_config, dtype):
        vc = hf_config.vision_config
        self.dtype = dtype
        self.num_layers = vc.num_hidden_layers
        self.hidden_size = vc.hidden_size
        self.num_heads = vc.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.patch_size = vc.patch_size
        self.image_size = vc.image_size
        self.num_channels = getattr(vc, "num_channels", 3)
        self.intermediate_size = vc.intermediate_size
        self.pixel_shuffle_ratio = vc.pixel_shuffle_ratio
        self.projector_input_dim = vc.projector_input_dim
        self.norm_eps = getattr(vc, "norm_eps", 1e-5)
        self.scale = self.head_dim**-0.5
        cos, sin = _vision_rope_tables(self.image_size, self.patch_size,
                                       self.hidden_size, self.num_heads,
                                       vc.rope_theta)
        self.rope_cos = jnp.asarray(cos)
        self.rope_sin = jnp.asarray(sin)

    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        np_dtype = np.dtype(jnp.dtype(self.dtype))
        tensors: dict[str, np.ndarray] = {}
        for name, t in iter_safetensors(model_dir):
            if name.startswith(("vision_model.", "multi_modal_projector.")):
                tensors[name] = t

        def get(name, tf=None, required=True):
            if name not in tensors:
                if required:
                    raise KeyError(f"missing vision tensor {name}")
                return None
            t = tensors[name].astype(np_dtype)
            return tf(t) if tf else t

        V = "vision_model."
        layers = []
        for i in range(self.num_layers):
            L = f"{V}model.layers.{i}."
            layers.append({
                "ln1_w": get(L + "input_layernorm.weight"),
                "ln1_b": get(L + "input_layernorm.bias"),
                "ln2_w": get(L + "post_attention_layernorm.weight"),
                "ln2_b": get(L + "post_attention_layernorm.bias"),
                "wq": get(L + "self_attn.q_proj.weight", transpose),
                "bq": get(L + "self_attn.q_proj.bias", required=False),
                "wk": get(L + "self_attn.k_proj.weight", transpose),
                "bk": get(L + "self_attn.k_proj.bias", required=False),
                "wv": get(L + "self_attn.v_proj.weight", transpose),
                "bv": get(L + "self_attn.v_proj.bias", required=False),
                "wo": get(L + "self_attn.o_proj.weight", transpose),
                "bo": get(L + "self_attn.o_proj.bias", required=False),
                "fc1_w": get(L + "mlp.fc1.weight", transpose),
                "fc1_b": get(L + "mlp.fc1.bias", required=False),
                "fc2_w": get(L + "mlp.fc2.weight", transpose),
                "fc2_b": get(L + "mlp.fc2.bias", required=False),
            })
        params = {
            "patch_w": get(V + "patch_embedding.linear.weight", transpose),
            "class_embedding": get(V + "class_embedding"),
            "pos_embed": get(V + "positional_embedding_vlm"),
            "ln_pre_w": get(V + "layernorm_pre.weight"),
            "ln_pre_b": get(V + "layernorm_pre.bias"),
            "ln_post_w": get(V + "layernorm_post.weight"),
            "ln_post_b": get(V + "layernorm_post.bias"),
            "adapter_fc1": get(V + "vision_adapter.mlp.fc1.weight",
                               transpose),
            "adapter_fc2": get(V + "vision_adapter.mlp.fc2.weight",
                               transpose),
            "projector": get("multi_modal_projector.linear_1.weight",
                             transpose),
            "layers": layers,
        }
        return jax.tree.map(
            lambda t: jnp.asarray(t) if t is not None else None, params)

    # ------------------------------------------------------------------

    def forward(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [T, C, H, W] (T = image tiles). Returns projected
        image features [T, out_patches, text_hidden]."""
        T = pixel_values.shape[0]
        p = self.patch_size
        # Unfold: [T, C, H, W] -> [T, num_patches, C*p*p] matching torch
        # nn.Unfold channel-major patch layout.
        x = pixel_values.reshape(T, self.num_channels,
                                 self.image_size // p, p,
                                 self.image_size // p, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # [T, hP, wP, C, p, p]
        x = x.reshape(T, -1, self.num_channels * p * p)
        x = (x.astype(self.dtype) @ params["patch_w"])  # [T, P, hidden]
        cls = jnp.broadcast_to(params["class_embedding"][None, None],
                               (T, 1, self.hidden_size))
        x = jnp.concatenate([x, cls], axis=1)  # CLS appended LAST
        x = x + params["pos_embed"].astype(x.dtype)
        x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"])

        P1 = x.shape[1]
        nH, D = self.num_heads, self.head_dim
        for lp in params["layers"]:
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
            q = h @ lp["wq"]
            k = h @ lp["wk"]
            v = h @ lp["wv"]
            if lp["bq"] is not None:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.reshape(T, P1, nH, D)
            k = k.reshape(T, P1, nH, D)
            v = v.reshape(T, P1, nH, D)
            q = _rope_pairs(q, self.rope_cos, self.rope_sin)
            k = _rope_pairs(k, self.rope_cos, self.rope_sin)
            scores = jnp.einsum("tphd,tqhd->thpq", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores * self.scale, axis=-1)
            attn = jnp.einsum("thpq,tqhd->tphd", probs.astype(v.dtype), v)
            attn = attn.reshape(T, P1, nH * D)
            o = attn @ lp["wo"]
            if lp["bo"] is not None:
                o = o + lp["bo"]
            x = x + o
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
            h1 = h @ lp["fc1_w"]
            if lp["fc1_b"] is not None:
                h1 = h1 + lp["fc1_b"]
            h1 = jax.nn.gelu(h1, approximate=False)
            h2 = h1 @ lp["fc2_w"]
            if lp["fc2_b"] is not None:
                h2 = h2 + lp["fc2_b"]
            x = x + h2

        x = layer_norm(x, params["ln_post_w"], params["ln_post_b"])
        x = x[:, :-1]  # drop CLS
        # Pixel-shuffle adapter: fc1 -> gelu -> fc2 -> gelu (HF MLP2).
        x = _pixel_shuffle(x, self.pixel_shuffle_ratio)
        x = jax.nn.gelu(x @ params["adapter_fc1"], approximate=False)
        x = jax.nn.gelu(x @ params["adapter_fc2"], approximate=False)
        return x @ params["projector"]
