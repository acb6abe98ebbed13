# SPDX-License-Identifier: Apache-2.0
"""Mllama (Llama 3.2 Vision) — gated cross-attention multimodal family.

TPU-native implementation of the reference's MllamaForConditionalGeneration
support (family list: vllm_neuron/worker/constants.py:4-7; the reference
delegates to NxDI graphs, neuronx_distributed_model_loader.py:399-556).
Architecture (HF parity):

- Vision: two-stage ViT over image tiles — pre/post tile+position
  embeddings gated by tanh scalars, a plain local transformer, then a
  tanh-gated global transformer; output = final hidden concatenated with
  ``intermediate_layers_indices`` hidden states, projected to the text
  hidden size.
- Text: a Llama decoder where the layers at ``cross_attention_layers``
  indices are tanh-gated CROSS-attention blocks (q from text with q-norm,
  k/v from the projected vision states with k-norm; no rope). With no
  image, cross layers are skipped entirely (HF text-only contract) — so
  text-only serving runs through the standard engine path.

Self-attention layers use the shared paged-KV ops; cross layers hold no
paged KV (their K/V derive from per-request vision states), and the paged
cache is COMPACTED to self layers only (num_kv_layers).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import ModelConfig
from vllm_neuron_tpu.models.weights import iter_safetensors, transpose
from vllm_neuron_tpu.ops.norm import layer_norm, rms_norm
from vllm_neuron_tpu.ops.quant import linear
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                  ragged_attention,
                                                  write_kv_pages)
from vllm_neuron_tpu.ops.rope import apply_rope, compute_inv_freq
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


class MllamaVisionEncoder:
    """Functional Mllama vision model + multimodal projector.

    forward(pixel_values [B, M, T, C, H, W], aspect_ratio_ids [B, M],
    aspect_ratio_mask [B, M, T]) -> cross-attention states
    [B, M*T*num_patches, text_hidden] (padding patches removed, matching
    HF's sliced output).
    """

    # Vision states feed gated cross-attention, not the embed stream.
    merge = "cross"

    def __init__(self, hf_config, dtype):
        vc = hf_config.vision_config
        self.dtype = dtype
        self.hidden_size = vc.hidden_size
        self.num_heads = vc.attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.num_layers = vc.num_hidden_layers
        self.num_global_layers = vc.num_global_layers
        self.image_size = vc.image_size
        self.patch_size = vc.patch_size
        self.max_num_tiles = vc.max_num_tiles
        self.num_channels = getattr(vc, "num_channels", 3)
        self.intermediate_layers_indices = list(
            vc.intermediate_layers_indices)
        self.norm_eps = getattr(vc, "norm_eps", 1e-5)
        self.text_hidden = hf_config.text_config.hidden_size
        self.num_patches = (self.image_size // self.patch_size)**2 + 1
        self.scale = self.head_dim**-0.5

    # -- weights --------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        np_dtype = np.dtype(jnp.dtype(self.dtype))
        tensors: dict[str, np.ndarray] = {}
        for name, t in iter_safetensors(model_dir):
            for pre in ("model.", ""):
                if name.startswith((pre + "vision_model.",
                                    pre + "multi_modal_projector.")):
                    tensors[name[len(pre):]] = t
                    break

        def get(name, tf=None):
            if name not in tensors:
                raise KeyError(f"missing vision tensor {name}")
            t = tensors[name].astype(np_dtype)
            return tf(t) if tf else t

        V = "vision_model."

        def vit_layers(stem: str, n: int, gated: bool) -> list[dict]:
            out = []
            for i in range(n):
                L = f"{V}{stem}.layers.{i}."
                lp = {
                    "ln1_w": get(L + "input_layernorm.weight"),
                    "ln1_b": get(L + "input_layernorm.bias"),
                    "ln2_w": get(L + "post_attention_layernorm.weight"),
                    "ln2_b": get(L + "post_attention_layernorm.bias"),
                    "wq": get(L + "self_attn.q_proj.weight", transpose),
                    "wk": get(L + "self_attn.k_proj.weight", transpose),
                    "wv": get(L + "self_attn.v_proj.weight", transpose),
                    "wo": get(L + "self_attn.o_proj.weight", transpose),
                    "fc1_w": get(L + "mlp.fc1.weight", transpose),
                    "fc1_b": get(L + "mlp.fc1.bias"),
                    "fc2_w": get(L + "mlp.fc2.weight", transpose),
                    "fc2_b": get(L + "mlp.fc2.bias"),
                }
                if gated:
                    lp["gate_attn"] = get(L + "gate_attn")
                    lp["gate_ffn"] = get(L + "gate_ffn")
                out.append(lp)
            return out

        patch = tensors[V + "patch_embedding.weight"]
        patch = patch.reshape(patch.shape[0], -1).T.astype(np_dtype)
        params = {
            "patch_w": patch,
            "class_embedding": get(V + "class_embedding"),
            "pos_embed": get(V + "gated_positional_embedding.embedding"),
            "pos_gate": get(V + "gated_positional_embedding.gate"),
            "tile_pos_embed": get(
                V + "gated_positional_embedding.tile_embedding.weight"),
            "pre_tile_embed": get(
                V + "pre_tile_positional_embedding.embedding.weight"),
            "pre_tile_gate": get(V + "pre_tile_positional_embedding.gate"),
            "post_tile_embed": get(
                V + "post_tile_positional_embedding.embedding.weight"),
            "post_tile_gate": get(
                V + "post_tile_positional_embedding.gate"),
            "ln_pre_w": get(V + "layernorm_pre.weight"),
            "ln_pre_b": get(V + "layernorm_pre.bias"),
            "ln_post_w": get(V + "layernorm_post.weight"),
            "ln_post_b": get(V + "layernorm_post.bias"),
            "proj_w": get("multi_modal_projector.weight", transpose),
            "proj_b": get("multi_modal_projector.bias"),
            "local_layers": vit_layers("transformer", self.num_layers,
                                       False),
            "global_layers": vit_layers("global_transformer",
                                        self.num_global_layers, True),
        }
        return jax.tree.map(jnp.asarray, params)

    # -- forward --------------------------------------------------------

    def _vit_layer(self, lp: dict, x: jax.Array, mask: jax.Array,
                   gated: bool) -> jax.Array:
        B, P, _ = x.shape
        nH, D = self.num_heads, self.head_dim
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.norm_eps)
        q = (h @ lp["wq"]).reshape(B, P, nH, D)
        k = (h @ lp["wk"]).reshape(B, P, nH, D)
        v = (h @ lp["wv"]).reshape(B, P, nH, D)
        scores = jnp.einsum("bphd,bqhd->bhpq", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        scores = scores + mask[:, None].astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhpq,bqhd->bphd", probs.astype(v.dtype), v)
        a = attn.reshape(B, P, nH * D) @ lp["wo"]
        if gated:
            a = jnp.tanh(lp["gate_attn"]) * a
        x = x + a
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.norm_eps)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        m = h @ lp["fc2_w"] + lp["fc2_b"]
        if gated:
            m = jnp.tanh(lp["gate_ffn"]) * m
        return x + m

    def forward(self, params: dict, pixel_values: jax.Array,
                aspect_ratio_ids: jax.Array, aspect_ratio_mask: jax.Array
                ) -> jax.Array:
        B, M, T, C, Hpx, Wpx = pixel_values.shape
        p = self.patch_size
        grid = self.image_size // p
        np_ = self.num_patches  # patches + CLS
        Hv = self.hidden_size

        x = pixel_values.reshape(B * M * T, C, grid, p, grid, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
        x = x.reshape(B * M * T, grid * grid, C * p * p)
        x = x.astype(self.dtype) @ params["patch_w"]  # [BMT, P0, Hv]

        ar_ids = aspect_ratio_ids.reshape(B * M)
        # Pre-tile embedding (gated): [BM, T, 1, Hv]
        pre = params["pre_tile_embed"][ar_ids].reshape(
            B * M, self.max_num_tiles, 1, Hv)[:, :T]
        x = x.reshape(B * M, T, grid * grid, Hv)
        x = x + jnp.tanh(params["pre_tile_gate"]) * pre.astype(x.dtype)

        # CLS first, then gated position embeddings.
        x = x.reshape(B * M * T, grid * grid, Hv)
        cls = jnp.broadcast_to(params["class_embedding"][None, None],
                               (B * M * T, 1, Hv)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)  # [BMT, np_, Hv]
        x = x.reshape(B * M, T, np_, Hv)
        gate = jnp.tanh(params["pos_gate"])
        x = x + ((1 - gate) * params["pos_embed"]).astype(
            x.dtype)[None, None]
        tile_pos = params["tile_pos_embed"][ar_ids].reshape(
            B * M, self.max_num_tiles, np_, Hv)[:, :T]
        x = x + (gate * tile_pos).astype(x.dtype)
        x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"],
                        self.norm_eps)

        # Pad patches to a multiple of 8 (HF kernel-alignment quirk kept
        # for numerical parity of the attention mask layout).
        pad = (8 - np_ % 8) % 8
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        pp = np_ + pad

        # Tile-level attention mask (HF _prepare_aspect_ratio_attention_mask
        # parity): with v = valid(tile)*valid(patch) and u = 1 - v, the mask
        # is u u^T * finfo.min — i.e. a pair is masked only when BOTH
        # positions are invalid (valid queries still see zero-padded invalid
        # keys; kept for exact numerical parity with HF).
        amask = aspect_ratio_mask.reshape(B * M, T).astype(jnp.float32)
        patch_valid = jnp.concatenate(
            [jnp.ones((np_,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
        vec = (amask[:, :, None] * patch_valid[None, None]).reshape(
            B * M, T * pp, 1)
        inv = 1.0 - vec
        neg = float(jnp.finfo(jnp.float32).min)
        mask = (inv @ jnp.swapaxes(inv, 1, 2)) * neg  # [BM, Tpp, Tpp]

        x = x.reshape(B * M, T * pp, Hv)
        inter = []
        for li, lp in enumerate(params["local_layers"]):
            x = self._vit_layer(lp, x, mask, gated=False)
            # HF (transformers>=4.5x) hidden_states are layer OUTPUTS
            # (input embedding not included): index i = layer i's output.
            if li in self.intermediate_layers_indices:
                inter.append(x)
        x = layer_norm(x, params["ln_post_w"], params["ln_post_b"],
                        self.norm_eps)

        x = x.reshape(B * M, T, pp, Hv)
        post = params["post_tile_embed"][ar_ids].reshape(
            B * M, self.max_num_tiles, 1, Hv)[:, :T]
        x = x + jnp.tanh(params["post_tile_gate"]) * post.astype(x.dtype)
        x = x.reshape(B * M, T * pp, Hv)
        for lp in params["global_layers"]:
            x = self._vit_layer(lp, x, mask, gated=True)

        # Drop padding patches; concat intermediate states (vision_output
        # dim = Hv * (1 + len(intermediate))).
        x = x.reshape(B * M, T, pp, Hv)[:, :, :np_]
        inter = jnp.stack(inter, axis=-1)  # [BM, Tpp, Hv, n_int]
        inter = inter.reshape(B * M, T, pp, -1)[:, :, :np_]
        feats = jnp.concatenate([x, inter], axis=-1)
        out = feats @ params["proj_w"] + params["proj_b"]
        return out.reshape(B, M * T * np_, self.text_hidden)


# ---------------------------------------------------------------------------
# Text decoder with interleaved gated cross-attention
# ---------------------------------------------------------------------------


class MllamaForCausalLM:
    """Functional Mllama text decoder. Self layers use the shared paged-KV
    attention ops; cross layers apply tanh-gated attention over per-request
    vision states (``cross_states``). With cross_states=None the cross
    layers are skipped (HF text-only contract), so the class serves
    text-only requests through the unchanged engine path."""

    # Projections eligible for weight quantization (self AND cross
    # layers); embed/lm_head/norms/gates stay dense, matching the
    # llama-family policy (llama.py QUANTIZABLE).
    QUANTIZABLE = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")

    def __init__(self, model_config: ModelConfig, quant_config=None):
        cfg = model_config.text_config
        self.dtype = model_config.dtype
        self.num_layers = cfg.num_hidden_layers
        self.hidden_size = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.num_kv_heads = getattr(cfg, "num_key_value_heads",
                                    self.num_heads)
        self.head_dim = getattr(cfg, "head_dim",
                                self.hidden_size // self.num_heads)
        self.vocab_size = cfg.vocab_size
        self.intermediate_size = cfg.intermediate_size
        self.rms_eps = getattr(cfg, "rms_norm_eps", 1e-5)
        self.cross_layers = sorted(
            getattr(cfg, "cross_attention_layers", []) or [])
        cross = set(self.cross_layers)
        self.self_layers = [i for i in range(self.num_layers)
                            if i not in cross]
        # Paged KV compaction: only self layers hold paged K/V.
        self.num_kv_layers = len(self.self_layers)
        self.scale = self.head_dim**-0.5
        self.inv_freq = compute_inv_freq(
            self.head_dim, getattr(cfg, "rope_theta", 500000.0),
            getattr(cfg, "rope_scaling", None))
        self.attention_scaling = 1.0
        self.tie_embeddings = getattr(cfg, "tie_word_embeddings", False)
        self.sliding_window = None
        self.sp_sharding = None
        # Per-channel weight quantization over all decoder projections
        # (self AND cross layers); embed/lm_head/norms/gates stay dense,
        # matching the llama-family policy.
        self.quant = quant_config if (quant_config is not None
                                      and quant_config.enabled) else None

    # -- weights --------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        np_dtype = np.dtype(jnp.dtype(self.dtype))
        tensors: dict[str, np.ndarray] = {}
        for name, t in iter_safetensors(model_dir):
            for pre in ("language_model.", "model.language_model.",
                        "model.", ""):
                if name.startswith(pre + "model.layers.") or \
                        name.startswith(pre + "layers.") or name in (
                        pre + "model.embed_tokens.weight",
                        pre + "model.norm.weight",
                        pre + "embed_tokens.weight",
                        pre + "norm.weight",
                        pre + "lm_head.weight", "lm_head.weight"):
                    stripped = name[len(pre):]
                    if stripped.startswith("model."):
                        stripped = stripped[len("model."):]
                    tensors[stripped] = t
                    break

        def get(name, tf=None):
            t = tensors[name].astype(np_dtype)
            return tf(t) if tf else t

        layers: list[dict] = []
        for i in range(self.num_layers):
            L = f"layers.{i}."
            if i in set(self.cross_layers):
                layers.append({
                    "attn_norm": get(L + "input_layernorm.weight"),
                    "mlp_norm": get(L + "post_attention_layernorm.weight"),
                    "wq": get(L + "cross_attn.q_proj.weight", transpose),
                    "wk": get(L + "cross_attn.k_proj.weight", transpose),
                    "wv": get(L + "cross_attn.v_proj.weight", transpose),
                    "wo": get(L + "cross_attn.o_proj.weight", transpose),
                    "q_norm": get(L + "cross_attn.q_norm.weight"),
                    "k_norm": get(L + "cross_attn.k_norm.weight"),
                    "gate_attn": get(L + "cross_attn_attn_gate"),
                    "gate_mlp": get(L + "cross_attn_mlp_gate"),
                    "wg": get(L + "mlp.gate_proj.weight", transpose),
                    "wu": get(L + "mlp.up_proj.weight", transpose),
                    "wd": get(L + "mlp.down_proj.weight", transpose),
                })
            else:
                layers.append({
                    "attn_norm": get(L + "input_layernorm.weight"),
                    "mlp_norm": get(L + "post_attention_layernorm.weight"),
                    "wq": get(L + "self_attn.q_proj.weight", transpose),
                    "wk": get(L + "self_attn.k_proj.weight", transpose),
                    "wv": get(L + "self_attn.v_proj.weight", transpose),
                    "wo": get(L + "self_attn.o_proj.weight", transpose),
                    "wg": get(L + "mlp.gate_proj.weight", transpose),
                    "wu": get(L + "mlp.up_proj.weight", transpose),
                    "wd": get(L + "mlp.down_proj.weight", transpose),
                })
        params = {
            # Mllama reserves 8 extra embedding rows past vocab_size for
            # the image/special tokens (HF: nn.Embedding(vocab + 8, H)).
            "embed": get("embed_tokens.weight"),
            "final_norm": get("norm.weight"),
            "lm_head": get("lm_head.weight", transpose),
            "layers": layers,
        }
        self._quantize_layers(params["layers"])
        from vllm_neuron_tpu.models.llama import LlamaForCausalLM
        LlamaForCausalLM._quantize_lm_head(self, params)
        return jax.tree.map(jnp.asarray, params)

    def _quantize_layers(self, layers: list[dict]) -> None:
        """Replace eligible [K, N] projections with quantized values +
        scales (shared policy incl. int4 routing: ops/quant.py). Applies
        to both self- and cross-attention layers."""
        from vllm_neuron_tpu.ops.quant import quantize_projections
        for lp in layers:
            quantize_projections(lp, self.QUANTIZABLE, self.quant)

    def random_params(self, rng: jax.Array, scale: float = 0.02) -> dict:
        H, D, I = self.hidden_size, self.head_dim, self.intermediate_size
        nH, nKV = self.num_heads, self.num_kv_heads
        key = [rng]

        def w(shape):
            key[0], k = jax.random.split(key[0])
            return (jax.random.normal(k, shape, jnp.float32) *
                    scale).astype(self.dtype)

        layers = []
        for i in range(self.num_layers):
            lp = {
                "attn_norm": jnp.ones((H,), self.dtype),
                "mlp_norm": jnp.ones((H,), self.dtype),
                "wq": w((H, nH * D)), "wk": w((H, nKV * D)),
                "wv": w((H, nKV * D)), "wo": w((nH * D, H)),
                "wg": w((H, I)), "wu": w((H, I)), "wd": w((I, H)),
            }
            if i in set(self.cross_layers):
                lp.update({
                    "q_norm": jnp.ones((D,), self.dtype),
                    "k_norm": jnp.ones((D,), self.dtype),
                    "gate_attn": jnp.zeros((1,), self.dtype),
                    "gate_mlp": jnp.zeros((1,), self.dtype),
                })
            layers.append(lp)
        # Tiny shapes only (bench/tests): quantize host-side like
        # load_params; the llama-family on-device path is for 8B+ stacks.
        self._quantize_layers(layers)
        return jax.tree.map(jnp.asarray, {
            "embed": w((self.vocab_size + 8, H)),
            "final_norm": jnp.ones((H,), self.dtype),
            "lm_head": w((H, self.vocab_size)),
            "layers": layers,
        })

    # -- forward --------------------------------------------------------

    def compute_cross_kv(self, params: dict,
                         cross_states: jax.Array) -> jax.Array:
        """Per-cross-layer K/V from projected vision states [T, H] ->
        [n_cross, T, 2*nKV, D] (K stored post-k_norm, the form attention
        consumes). Run once at prefill; serving caches the result per
        request row (the encoder-KV analogue of the paged text cache)."""
        nKV, D = self.num_kv_heads, self.head_dim
        T = cross_states.shape[0]
        outs = []
        for li in self.cross_layers:
            lp = params["layers"][li]
            k = linear(cross_states, lp, "wk").reshape(T, nKV, D)
            k = rms_norm(k, lp["k_norm"], self.rms_eps)
            v = linear(cross_states, lp, "wv").reshape(T, nKV, D)
            outs.append(jnp.concatenate([k, v], axis=1))
        return jnp.stack(outs)

    def forward(self, params: dict, input_ids: jax.Array,
                positions: jax.Array, kv_pages: jax.Array, meta: RaggedMeta,
                *, kind: str = "mixed", attn_backend: Optional[str] = None,
                cross_states: Optional[jax.Array] = None,
                cross_valid: Optional[jax.Array] = None,
                cross_cache: Optional[tuple] = None,
                cross_rows: Optional[jax.Array] = None,
                ) -> tuple[jax.Array, jax.Array]:
        """cross_states: [S, T_img, H] per-sequence projected vision states
        (None => text-only: cross layers are skipped). cross_valid:
        [S, T_img] bool visibility of each vision token (padding tiles).
        cross_cache: serving-path alternative — (cross_kv
        [n_cross, R, T, 2nKV, D], valid [R, T]) precomputed per engine row
        (compute_cross_kv), with cross_rows [N] mapping each token to its
        row. Rows with no visible vision token contribute exactly zero
        (HF full_text_row_masked_out_mask semantics), so text-only
        requests in a mixed batch match the skip-layers contract."""
        N = input_ids.shape[0]
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        L, pages, page_size, combined, Dp = kv_pages.shape
        x = params["embed"][input_ids]
        kv_flat = kv_pages.reshape(L * pages, page_size, combined, Dp)
        valid = meta.slot_mapping >= 0

        cross_set = set(self.cross_layers)
        kv_l = 0  # compacted paged-KV slot of the next self layer
        ci = 0  # index into the cross-layer KV cache
        for li, lp in enumerate(params["layers"]):
            if li in cross_set:
                if cross_states is not None:
                    x = self._cross_layer(lp, x, meta, cross_states,
                                          cross_valid)
                elif cross_cache is not None:
                    x = self._cross_layer_cached(lp, ci, x, cross_cache,
                                                 cross_rows)
                ci += 1
                continue
            l = kv_l
            kv_l += 1
            h = rms_norm(x, lp["attn_norm"], self.rms_eps)
            q = linear(h, lp, "wq").reshape(N, nH, D)
            k = linear(h, lp, "wk").reshape(N, nKV, D)
            v = linear(h, lp, "wv").reshape(N, nKV, D)
            q, k = apply_rope(q, k, positions, self.inv_freq,
                              self.attention_scaling)
            slots_l = jnp.where(valid,
                                meta.slot_mapping + l * (pages * page_size),
                                -1)
            kv_flat = write_kv_pages(kv_flat, k, v, slots_l)
            meta_l = dataclasses.replace(
                meta, slot_mapping=slots_l,
                page_indices=meta.page_indices + l * pages)
            attn = ragged_attention(q, kv_flat, meta_l, self.scale,
                                    None, kind=kind, backend=attn_backend)
            x = x + linear(attn.reshape(N, nH * D), lp, "wo")
            h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
            x = x + linear(jax.nn.silu(linear(h, lp, "wg")) *
                           linear(h, lp, "wu"), lp, "wd")
        return x, kv_flat.reshape(L, pages, page_size, combined, Dp)

    def _cross_layer(self, lp: dict, x: jax.Array, meta: RaggedMeta,
                     cross_states: jax.Array, cross_valid) -> jax.Array:
        """Tanh-gated cross-attention block (HF
        MllamaCrossAttentionDecoderLayer). Every token of sequence s
        attends to cross_states[s] (the image precedes the text in the
        Mllama prompt convention, so the full-row mask is all-ones for
        image-bearing sequences)."""
        N = x.shape[0]
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        G = nH // nKV
        S, T_img, H = cross_states.shape
        h = rms_norm(x, lp["attn_norm"], self.rms_eps)
        q = linear(h, lp, "wq").reshape(N, nH, D)
        q = rms_norm(q, lp["q_norm"], self.rms_eps)
        k = linear(cross_states, lp, "wk").reshape(S, T_img, nKV, D)
        k = rms_norm(k, lp["k_norm"], self.rms_eps)
        v = linear(cross_states, lp, "wv").reshape(S, T_img, nKV, D)
        # Token n belongs to the sequence whose cu_q_lens bucket holds n.
        token_idx = jnp.arange(N, dtype=jnp.int32)
        seq_of = jnp.clip(
            jnp.searchsorted(meta.cu_q_lens[1:meta.kv_lens.shape[0] + 1],
                             token_idx, side="right"), 0, S - 1)
        kq = k[seq_of]  # [N, T_img, nKV, D]
        vq = v[seq_of]
        qg = q.reshape(N, nKV, G, D)
        s = jnp.einsum("nkgd,ntkd->nkgt", qg.astype(jnp.float32),
                       kq.astype(jnp.float32)) * self.scale
        if cross_valid is not None:
            vis = cross_valid[seq_of]  # [N, T_img]
            s = jnp.where(vis[:, None, None], s,
                          float(jnp.finfo(jnp.float32).min))
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nkgt,ntkd->nkgd", p,
                       vq.astype(jnp.float32)).astype(x.dtype)
        o = linear(o.reshape(N, nH * D), lp, "wo")
        x = x + jnp.tanh(lp["gate_attn"]) * o
        h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
        m = linear(jax.nn.silu(linear(h, lp, "wg")) *
                   linear(h, lp, "wu"), lp, "wd")
        return x + jnp.tanh(lp["gate_mlp"]) * m

    def _cross_layer_cached(self, lp: dict, ci: int, x: jax.Array,
                            cross_cache: tuple, cross_rows: jax.Array
                            ) -> jax.Array:
        """Serving-path cross layer over per-row cached K/V. Gathers each
        token's row from the cache ([N, T, 2nKV, D] transient — at Mllama
        scale this is the encoder-KV working set, same order as one row of
        the paged gather); rows whose valid mask is empty (text-only
        requests, pad tokens pointing at a cleared row) get an exact-zero
        contribution from both the attention and the gated MLP."""
        ckv, cvalid = cross_cache
        N = x.shape[0]
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        G = nH // nKV
        kvr = ckv[ci][cross_rows]  # [N, T, 2nKV, D]
        k = kvr[:, :, :nKV]
        v = kvr[:, :, nKV:]
        vis = cvalid[cross_rows]  # [N, T]
        has_img = vis.any(axis=-1)  # [N]
        h = rms_norm(x, lp["attn_norm"], self.rms_eps)
        q = linear(h, lp, "wq").reshape(N, nH, D)
        q = rms_norm(q, lp["q_norm"], self.rms_eps)
        qg = q.reshape(N, nKV, G, D)
        s = jnp.einsum("nkgd,ntkd->nkgt", qg.astype(jnp.float32),
                       k.astype(jnp.float32)) * self.scale
        # finfo.min (finite) keeps the all-masked softmax NaN-free
        # (uniform); the has_img zeroing below discards those rows.
        s = jnp.where(vis[:, None, None], s,
                      float(jnp.finfo(jnp.float32).min))
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nkgt,ntkd->nkgd", p,
                       v.astype(jnp.float32)).astype(x.dtype)
        o = linear(o.reshape(N, nH * D), lp, "wo")
        gate = has_img[:, None].astype(x.dtype)
        x = x + gate * (jnp.tanh(lp["gate_attn"]) * o)
        h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
        m = linear(jax.nn.silu(linear(h, lp, "wg")) *
                   linear(h, lp, "wu"), lp, "wd")
        return x + gate * (jnp.tanh(lp["gate_mlp"]) * m)

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        h = rms_norm(hidden, params["final_norm"], self.rms_eps)
        scale = params.get("lm_head_scale")
        if scale is not None:
            return jnp.dot(h, params["lm_head"].astype(h.dtype),
                           preferred_element_type=jnp.float32) * scale
        return jnp.dot(h, params["lm_head"],
                       preferred_element_type=jnp.float32)
