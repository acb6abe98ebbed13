# SPDX-License-Identifier: Apache-2.0
"""Llava vision tower (CLIP ViT) + multimodal projector.

TPU-native analogue of the reference's Llava support (family list:
vllm_neuron/worker/constants.py:4-7; vision graph split:
neuronx_distributed_model_loader.py:399-556). Faithful functional port of
HF ``CLIPVisionModel`` + ``LlavaMultiModalProjector``:

conv patchify -> [CLS, patches] + learned position embeddings ->
pre-LayerNorm -> ViT layers (bidirectional attention with biases,
quick-GELU MLP) -> select hidden state at ``vision_feature_layer`` (default
-2: no post-LayerNorm) -> drop CLS ("default" strategy) ->
linear_1 -> GELU -> linear_2 into the text hidden size.

The runner merges the projected features into the token stream at the
image-token positions (the same embeds_override path Llama-4 uses).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_neuron_tpu.ops.norm import layer_norm
import numpy as np

from vllm_neuron_tpu.models.weights import iter_safetensors, transpose
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class LlavaVisionEncoder:
    """Functional CLIP ViT tower; weights from the composite checkpoint's
    ``vision_tower.*`` + ``multi_modal_projector.*`` tensors (old naming)
    or the ``model.``-prefixed post-4.52 flavor."""

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
        self.norm_eps = getattr(vc, "layer_norm_eps", 1e-5)
        self.scale = self.head_dim**-0.5
        # hidden_states index to tap (HF vision_feature_layer, default -2 =
        # second-to-last layer's output, NO post-layernorm).
        fl = getattr(hf_config, "vision_feature_layer", -2)
        self.feature_layer = fl if fl >= 0 else self.num_layers + 1 + fl
        self.drop_cls = getattr(hf_config, "vision_feature_select_strategy",
                                "default") == "default"

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

        V = "vision_tower.vision_model."
        layers = []
        for i in range(self.num_layers):
            L = f"{V}encoder.layers.{i}."
            layers.append({
                "ln1_w": get(L + "layer_norm1.weight"),
                "ln1_b": get(L + "layer_norm1.bias"),
                "ln2_w": get(L + "layer_norm2.weight"),
                "ln2_b": get(L + "layer_norm2.bias"),
                "wq": get(L + "self_attn.q_proj.weight", transpose),
                "bq": get(L + "self_attn.q_proj.bias"),
                "wk": get(L + "self_attn.k_proj.weight", transpose),
                "bk": get(L + "self_attn.k_proj.bias"),
                "wv": get(L + "self_attn.v_proj.weight", transpose),
                "bv": get(L + "self_attn.v_proj.bias"),
                "wo": get(L + "self_attn.out_proj.weight", transpose),
                "bo": get(L + "self_attn.out_proj.bias"),
                "fc1_w": get(L + "mlp.fc1.weight", transpose),
                "fc1_b": get(L + "mlp.fc1.bias"),
                "fc2_w": get(L + "mlp.fc2.weight", transpose),
                "fc2_b": get(L + "mlp.fc2.bias"),
            })
        # Conv2d patch kernel [H, C, p, p] -> matmul form [C*p*p, H] with
        # channel-major patch pixels (matches the unfold layout below).
        patch = tensors[V + "embeddings.patch_embedding.weight"]
        patch = patch.reshape(patch.shape[0], -1).T.astype(np_dtype)
        params = {
            "patch_w": patch,
            "class_embedding": get(V + "embeddings.class_embedding"),
            "pos_embed": get(V + "embeddings.position_embedding.weight"),
            "ln_pre_w": get(V + "pre_layrnorm.weight"),  # HF's typo
            "ln_pre_b": get(V + "pre_layrnorm.bias"),
            "proj1_w": get("multi_modal_projector.linear_1.weight",
                           transpose),
            "proj1_b": get("multi_modal_projector.linear_1.bias"),
            "proj2_w": get("multi_modal_projector.linear_2.weight",
                           transpose),
            "proj2_b": get("multi_modal_projector.linear_2.bias"),
            "layers": layers,
        }
        return jax.tree.map(jnp.asarray, params)

    # ------------------------------------------------------------------

    def forward(self, params: dict, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [B, C, H, W]. Returns projected image features
        [B, patches, text_hidden]."""
        B = pixel_values.shape[0]
        p = self.patch_size
        grid = self.image_size // p
        # Patchify as a matmul (channel-major patch pixels == the conv
        # kernel's flattened [C, p, p] layout).
        x = pixel_values.reshape(B, self.num_channels, grid, p, grid, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # [B, hP, wP, C, p, p]
        x = x.reshape(B, grid * grid, self.num_channels * p * p)
        x = x.astype(self.dtype) @ params["patch_w"]  # [B, P, hidden]
        cls = jnp.broadcast_to(params["class_embedding"][None, None],
                               (B, 1, self.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)  # CLS FIRST (CLIP layout)
        x = x + params["pos_embed"][None].astype(x.dtype)
        x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"],
                        self.norm_eps)

        P1 = x.shape[1]
        nH, D = self.num_heads, self.head_dim
        feats = x if self.feature_layer == 0 else None
        for li, lp in enumerate(params["layers"]):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.norm_eps)
            q = (h @ lp["wq"] + lp["bq"]).reshape(B, P1, nH, D)
            k = (h @ lp["wk"] + lp["bk"]).reshape(B, P1, nH, D)
            v = (h @ lp["wv"] + lp["bv"]).reshape(B, P1, nH, D)
            scores = jnp.einsum("bphd,bqhd->bhpq", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(scores * self.scale, axis=-1)
            attn = jnp.einsum("bhpq,bqhd->bphd", probs.astype(v.dtype), v)
            x = x + (attn.reshape(B, P1, nH * D) @ lp["wo"] + lp["bo"])
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.norm_eps)
            h = _quick_gelu(h @ lp["fc1_w"] + lp["fc1_b"])
            x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
            if li + 1 == self.feature_layer:
                feats = x
        assert feats is not None, "vision_feature_layer out of range"
        if self.drop_cls:
            feats = feats[:, 1:]
        out = jax.nn.gelu(feats @ params["proj1_w"] + params["proj1_b"],
                          approximate=False)
        return out @ params["proj2_w"] + params["proj2_b"]
