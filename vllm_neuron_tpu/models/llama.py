# SPDX-License-Identifier: Apache-2.0
"""Llama-family decoder (Llama 2 / 3.x, Qwen 2.5, Qwen 3 dense) in pure JAX.

TPU-native equivalent of the reference stack's NxDI llama/qwen model graphs
(reference resolves architectures to NxDI classes at
vllm_neuron/worker/neuronx_distributed_model_loader.py:634-659). Design:

- Layer-stacked params + ``lax.scan`` over layers: one compiled while-loop,
  not L inlined blocks.
- ONE forward function covers every serving phase (prefill / decode /
  chunked / prefix-hit / speculative verify) via the unified ragged token
  layout: tokens are a flat ``[N]`` stream, sequence structure lives in
  ``RaggedMeta`` (ops/ragged_attention.py).
- All matmuls hit the MXU in the model dtype (bf16 by default) with float32
  softmax/norm accumulation; logits are float32.
- KV is written to the paged cache inside the same jitted program
  (scatter via slot_mapping), so prefill + cache-update is one XLA program.

Architecture deltas handled here:
- Qwen2: QKV biases (``attention_bias``).
- Qwen3: per-head q/k RMSNorm (``q_norm``/``k_norm``).
"""
from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import ModelConfig, QuantConfig
from vllm_neuron_tpu.models.weights import (StackingLoader, iter_safetensors,
                                            transpose)
from vllm_neuron_tpu.ops.quant import (linear, quantize_per_channel,
                                       quantize_projections)
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                  ragged_attention,
                                                  write_kv_pages)
from vllm_neuron_tpu.ops.norm import rms_norm
from vllm_neuron_tpu.ops.rope import (apply_rope, compute_inv_freq,
                                      rope_attention_scaling)
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


class LlamaForCausalLM:
    """Functional Llama-family model: holds static hyperparameters; params are
    an explicit pytree threaded through jitted calls."""

    # Layer projections eligible for quantization (lm_head/embed stay
    # high-precision by default, mirroring common modules_to_not_convert
    # conventions; reference checkpoint convention: test/utils/server/
    # server.py:32-67).
    QUANTIZABLE = ("wqkv", "wq", "wk", "wv", "wo", "wgu", "wg", "wu",
                   "wd")

    def __init__(self, model_config: ModelConfig,
                 quant_config: Optional[QuantConfig] = None):
        self.quant = quant_config if (quant_config is not None
                                      and quant_config.enabled) else None
        # Composite checkpoints (Llava class) nest the decoder config under
        # text_config; text_config == hf_config for plain decoders.
        cfg = model_config.text_config
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
        self.qk_norm = cfg.model_type in ("qwen3", "qwen3_moe")
        # Sliding-window attention (Mistral; Qwen2 gates it behind
        # use_sliding_window).
        self.sliding_window = getattr(cfg, "sliding_window", None)
        if hasattr(cfg, "use_sliding_window") and \
                not cfg.use_sliding_window:
            self.sliding_window = None
        self.scale = self.head_dim**-0.5
        self.inv_freq = compute_inv_freq(
            self.head_dim, self.rope_theta, self.rope_scaling,
            getattr(cfg, "max_position_embeddings", None))
        # 1.0 for default/linear/llama3; yarn scales cos/sin magnitudes.
        self.attention_scaling = rope_attention_scaling(self.rope_scaling)
        # Sequence parallelism (reference semantics:
        # test/tiny/test_sequence_parallel.py:25-58): when set (a
        # NamedSharding over the token axis, installed by ModelRunner when
        # parallel.sequence_parallel is on), the residual stream is
        # constrained to it between matmul segments, so GSPMD turns the
        # Megatron all-reduces into reduce-scatter + all-gather pairs and
        # norm/elementwise work is split over the model axis.
        self.sp_sharding = None
        # Expert parallelism: the mesh (with an "expert" axis of size > 1),
        # set by the runner for MoE subclasses; ops/moe.py shard_maps the
        # expert FFN over it.
        self.ep_mesh = None

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def load_params(self, model_dir: str) -> dict:
        """Load an HF-format safetensors checkpoint into the stacked layout.

        Composite (multimodal) checkpoints prefix the decoder's tensors
        ("language_model." in Llava-class models, reference family list:
        vllm_neuron/worker/constants.py:4-7); the prefix is auto-detected
        from the tensor names."""
        stem, head = self._detect_prefix(model_dir)
        ld = StackingLoader(self.num_layers, self.dtype)
        L = stem + "layers.{i}."
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
        ld.register(stem + "embed_tokens.weight", "embed")
        ld.register(stem + "norm.weight", "final_norm")
        if not self.tie_embeddings:
            ld.register(head + "lm_head.weight", "lm_head", transpose)
        unused = []
        for name, tensor in iter_safetensors(model_dir):
            if not ld.consume(name, tensor):
                unused.append(name)
        if unused:
            logger.warning("ignored %d checkpoint tensors (e.g. %s)",
                           len(unused), unused[:4])
        params = ld.finalize()
        self._fuse_projections(params["layers"])
        if self.tie_embeddings:
            params["lm_head"] = np.ascontiguousarray(params["embed"].T)
        self._quantize_layer_params(params["layers"])
        self._quantize_lm_head(params)
        return jax.tree.map(jnp.asarray, params)

    def _quantize_lm_head(self, params: dict) -> None:
        """Opt-in int8 head (QuantConfig.quantize_lm_head). Always int8
        per-channel — the scale moves past the dot (output dim), so the
        weight read stays quantized with no custom kernel."""
        if self.quant is None or not getattr(self.quant, "quantize_lm_head",
                                             False):
            return
        if "lm_head" not in params or "lm_head" in set(
                self.quant.modules_to_not_convert):
            return
        wq, scale = quantize_per_channel(np.asarray(params["lm_head"]),
                                         "int8")
        params["lm_head"] = wq
        params["lm_head_scale"] = scale

    @staticmethod
    def _detect_prefix(model_dir: str) -> tuple[str, str]:
        """Find the decoder-tensor naming in a (possibly composite)
        checkpoint. Returns (stem, head_prefix): layer tensors live at
        ``stem + "layers.{i}."`` and lm_head at ``head_prefix +
        "lm_head.weight"``. Covers plain decoders ("model."), old-style
        composites ("language_model.model.") and the post-4.52 flavor
        ("model.language_model.")."""
        from vllm_neuron_tpu.models.weights import safetensors_names
        names = safetensors_names(model_dir)
        for stem, head in (("language_model.model.", "language_model."),
                           ("model.language_model.", ""),
                           ("model.", "")):
            if any(n.startswith(stem + "layers.0.")
                   or n.startswith(stem + "embed_tokens.") for n in names):
                return stem, head
        return "model.", ""

    def _fuse_projections(self, layers: dict) -> None:
        """Concatenate q/k/v and gate/up along the output dim: fewer, larger
        matmuls keep the MXU busier and halve per-op overhead on the decode
        path. The forward splits the outputs."""
        if all(k in layers for k in ("wq", "wk", "wv")):
            layers["wqkv"] = np.concatenate(
                [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")],
                axis=-1)
        if all(k in layers for k in ("bq", "bk", "bv")):
            layers["bqkv"] = np.concatenate(
                [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")],
                axis=-1)
        if all(k in layers for k in ("wg", "wu")):
            layers["wgu"] = np.concatenate(
                [layers.pop("wg"), layers.pop("wu")], axis=-1)

    def _quantize_layer_params(self, layers: dict) -> None:
        """Replace eligible [L, K, N] weight stacks with quantized values +
        scales (in place, host-side numpy; shared policy in ops/quant.py)."""
        quantize_projections(layers, self.QUANTIZABLE, self.quant)

    def random_params(self, rng: jax.Array, scale: float = 0.02) -> dict:
        """Random params (bench / dryrun without a checkpoint). With
        quantization on, each weight stack is generated AND quantized on
        device, one at a time — a large model's full-precision weights may
        not fit HBM all at once (the point of quantizing), and shipping
        them through the host is slow."""
        H, D, I, V = (self.hidden_size, self.head_dim,
                      self.intermediate_size, self.vocab_size)
        L, nH, nKV = self.num_layers, self.num_heads, self.num_kv_heads
        keys = iter(jax.random.split(rng, 16))

        def w(shape):
            return (jax.random.normal(next(keys), shape, jnp.float32) *
                    scale).astype(self.dtype)

        weight_shapes = {
            "wqkv": (L, H, (nH + 2 * nKV) * D),
            "wo": (L, nH * D, H),
            "wgu": (L, H, 2 * I),
            "wd": (L, I, H),
        }
        layers = {
            "attn_norm": jnp.ones((L, H), self.dtype),
            "mlp_norm": jnp.ones((L, H), self.dtype),
        }
        if self.qkv_bias:
            layers["bqkv"] = jnp.zeros((L, (nH + 2 * nKV) * D), self.dtype)
        if self.qk_norm:
            layers["q_norm"] = jnp.ones((L, D), self.dtype)
            layers["k_norm"] = jnp.ones((L, D), self.dtype)
        if self.quant is not None:
            qmax = 127.0 if self.quant.quantization == "int8" else 448.0
            qdtype = (jnp.int8 if self.quant.quantization == "int8" else
                      jnp.float8_e4m3fn)
            skip = set(self.quant.modules_to_not_convert)

            # Generate + quantize each stack ON DEVICE, one layer slice at a
            # time (lax.map keeps the f32 transient to a single layer), so
            # full-precision weights never exist in HBM or cross the host.
            import functools as _ft

            @_ft.partial(jax.jit, static_argnums=(1,))
            def gen_quant(key, layer_shape):
                def per_layer(k):
                    wf = jax.random.normal(k, layer_shape,
                                           jnp.float32) * scale
                    if self.quant.quantization == "int4":
                        from vllm_neuron_tpu.ops.quant import (
                            int4_group_size_for)
                        K, N = layer_shape
                        G = int4_group_size_for(
                            K, self.quant.int4_group_size)
                        Kg = K // G
                        g = wf.reshape(Kg, G, N)
                        absmax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
                        s = jnp.maximum(absmax / 7.0, 1e-12)
                        q = jnp.clip(jnp.round(g / s), -7,
                                     7).astype(jnp.int32).reshape(K, N)
                        lo, hi = q[:K // 2], q[K // 2:]
                        packed = ((lo & 0xF) | ((hi & 0xF) << 4)
                                  ).astype(jnp.int8)
                        return packed, s.reshape(Kg, N)
                    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
                    s = jnp.maximum(absmax / qmax, 1e-12)
                    scaled = wf / s
                    if self.quant.quantization == "int8":
                        q = jnp.clip(jnp.rint(scaled), -127,
                                     127).astype(qdtype)
                    else:
                        q = scaled.astype(qdtype)
                    return q, s
                return jax.lax.map(per_layer, jax.random.split(key, L))

            for name, shape in weight_shapes.items():
                if name in skip:
                    layers[name] = w(shape)
                    continue
                q, sc = gen_quant(next(keys), tuple(shape[1:]))
                layers[name] = q
                layers[name + "_scale"] = sc
        else:
            for name, shape in weight_shapes.items():
                layers[name] = w(shape)
        out = {
            "embed": w((V, H)),
            "final_norm": jnp.ones((H,), self.dtype),
            "lm_head": w((H, V)),
            "layers": layers,
        }
        if self.quant is not None and getattr(self.quant,
                                              "quantize_lm_head", False):
            lm = out["lm_head"].astype(jnp.float32)
            absmax = jnp.max(jnp.abs(lm), axis=0, keepdims=True)
            s = jnp.maximum(absmax / 127.0, 1e-12)
            out["lm_head_scale"] = s
            out["lm_head"] = jnp.clip(jnp.rint(lm / s), -127,
                                      127).astype(jnp.int8)
        return out

    # ------------------------------------------------------------------
    # Forward (unified ragged step)
    # ------------------------------------------------------------------

    def forward(self, params: dict, input_ids: jax.Array,
                positions: jax.Array, kv_pages: jax.Array, meta: RaggedMeta,
                *, kind: str = "mixed", attn_backend: Optional[str] = None,
                embeds_override: Optional[tuple] = None
                ) -> tuple[jax.Array, jax.Array]:
        """Run the decoder over a ragged token stream.

        input_ids/positions: [N] (flat over all sequences' new tokens);
        kv_pages: [L, num_pages, page_size, 2*Hkv, D], updated in place via
        donation at the jit boundary. Returns (hidden [N, H], kv_pages).
        """
        N = input_ids.shape[0]
        nH, nKV, D = self.num_heads, self.num_kv_heads, self.head_dim
        L, pages, page_size, combined, Dp = kv_pages.shape
        _sp = self._sp_constraint(N)
        x = params["embed"][input_ids]  # [N, H]
        if embeds_override is not None:
            # Multimodal (Llava-class): image-token rows carry projected
            # vision features (reference analogue: vision-mask embedding
            # merge, neuronx_distributed_model_loader.py:596-601).
            override, override_mask = embeds_override
            x = jnp.where(override_mask[:, None], override.astype(x.dtype),
                          x)
        x = _sp(x)
        # The cache is carried through the layer scan as ONE flat page array
        # [L*pages, ...]; each layer scatters into its own page range
        # (offset l*pages). A scan CARRY updated only by scatter keeps the
        # whole 10s-of-GB buffer in place across the XLA while loop — never
        # sliced, never copied.
        kv_flat = kv_pages.reshape(L * pages, page_size, combined, Dp)
        valid = meta.slot_mapping >= 0
        layer_ids = jnp.arange(L, dtype=jnp.int32)

        # Multi-LoRA: sort the token stream by adapter group ONCE; every
        # layer/projection reuses the permutation (ops/lora.py).
        lora = params.get("lora")
        lora_ctx = None
        if lora is not None and meta.adapter_ids is not None:
            from vllm_neuron_tpu.ops.lora import lora_delta, lora_sort_ctx
            num_groups = next(iter(
                lora["layers"].values()))["a"].shape[1]
            lora_ctx = lora_sort_ctx(
                jnp.where(valid, meta.adapter_ids, 0), num_groups)

        def _lora(ll, name, inp, out):
            """out += delta from the per-token adapter, if `name` is a
            registered LoRA target."""
            if lora_ctx is None or ll is None or name not in ll:
                return out
            return out + lora_delta(inp, ll[name]["a"], ll[name]["b"],
                                    lora_ctx)

        # Grouped-int4 projections take the copy-free STACKED kernel: their
        # weights stay out of the scan xs (a scan-sliced operand to a
        # Pallas call forces a full materialized copy per layer; see
        # ops/quant.dequant_matmul_int4_stacked) and the layer body injects
        # a StackedInt4 marker carrying the traced layer index instead.
        # Under a mesh the jnp chain is GSPMD-partitioned, so slicing stays.
        from vllm_neuron_tpu.ops.quant import StackedInt4
        from vllm_neuron_tpu.ops.ragged_attention import get_attention_mesh
        layers_xs = params["layers"]
        stacked_i4 = {}
        # Dispatch is keyed on the QUANT CONFIG (int4 + a quantizable
        # projection name), not on scale rank alone — a future stacked
        # per-group scale for some other scheme must not silently route
        # into the nibble-unpack kernel.
        if (get_attention_mesh() is None and self.quant is not None
                and self.quant.quantization == "int4"):
            stacked_i4 = {
                k: (layers_xs[k], layers_xs[k + "_scale"])
                for k, v in layers_xs.items()
                if k in self.QUANTIZABLE
                and (k + "_scale") in layers_xs
                and getattr(layers_xs[k + "_scale"], "ndim", 0) == 3
                and layers_xs[k + "_scale"].shape[1] > 1
            }
            if stacked_i4:
                layers_xs = {k: v for k, v in layers_xs.items()
                             if k not in stacked_i4
                             and k.removesuffix("_scale") not in stacked_i4}

        def layer(carry, xs):
            x, kv_flat = carry
            lp, ll, l = xs
            if stacked_i4:
                lp = dict(lp)
                for k, (pk, sc) in stacked_i4.items():
                    lp[k] = StackedInt4(pk, sc, l)
            h = rms_norm(x, lp["attn_norm"], self.rms_eps)
            if "wqkv" in lp:
                qkv = linear(h, lp, "wqkv")
                if self.qkv_bias:
                    qkv = qkv + lp["bqkv"]
                q, k, v = jnp.split(qkv, [nH * D, (nH + nKV) * D], axis=-1)
            else:  # unfused layout (MoE subclasses' loaders)
                q = linear(h, lp, "wq")
                k = linear(h, lp, "wk")
                v = linear(h, lp, "wv")
                if self.qkv_bias:
                    q = q + lp["bq"]
                    k = k + lp["bk"]
                    v = v + lp["bv"]
            q = _lora(ll, "wq", h, q)
            k = _lora(ll, "wk", h, k)
            v = _lora(ll, "wv", h, v)
            q = q.reshape(N, nH, D)
            k = k.reshape(N, nKV, D)
            v = v.reshape(N, nKV, D)
            if self.qk_norm:
                q = rms_norm(q, lp["q_norm"], self.rms_eps)
                k = rms_norm(k, lp["k_norm"], self.rms_eps)
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
                                    self.sliding_window, kind=kind,
                                    backend=attn_backend)
            ao = attn.reshape(N, nH * D)
            x = _sp(x + _lora(ll, "wo", ao, linear(ao, lp, "wo")))
            h = rms_norm(x, lp["mlp_norm"], self.rms_eps)
            if lora_ctx is not None and ll is not None and any(
                    t in ll for t in ("wg", "wu", "wd")):
                x = _sp(x + self._mlp_lora(lp, h, ll, _lora))
            else:
                x = _sp(x + self._mlp(lp, h))
            return (x, kv_flat), None

        (x, kv_flat), _ = jax.lax.scan(
            layer, (x, kv_flat),
            (layers_xs, lora["layers"] if lora is not None else None,
             layer_ids))
        return x, kv_flat.reshape(L, pages, page_size, combined, Dp)

    def _sp_constraint(self, num_tokens: int):
        from vllm_neuron_tpu.parallel.sharding import sp_constraint
        return sp_constraint(self.sp_sharding, num_tokens)

    def _mlp(self, lp: dict, h: jax.Array) -> jax.Array:
        """SwiGLU FFN; overridden by MoE variants."""
        if "wgu" in lp:
            gu = linear(h, lp, "wgu")
            gate, up = jnp.split(gu, 2, axis=-1)
            return linear(jax.nn.silu(gate) * up, lp, "wd")
        gate = jax.nn.silu(linear(h, lp, "wg"))
        return linear(gate * linear(h, lp, "wu"), lp, "wd")

    def _mlp_lora(self, lp: dict, h: jax.Array, ll: dict,
                  _lora) -> jax.Array:
        """Dense SwiGLU with LoRA deltas on gate/up/down (MoE subclasses
        support attention-projection LoRA only)."""
        if "wgu" in lp:
            gu = linear(h, lp, "wgu")
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = linear(h, lp, "wg")
            up = linear(h, lp, "wu")
        gate = _lora(ll, "wg", h, gate)
        up = _lora(ll, "wu", h, up)
        inter = jax.nn.silu(gate) * up
        return _lora(ll, "wd", inter, linear(inter, lp, "wd"))

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        """hidden: [N, H] -> logits [N, V] float32."""
        h = rms_norm(hidden, params["final_norm"], self.rms_eps)
        scale = params.get("lm_head_scale")
        if scale is not None:
            # int8 head: convert fuses into the dot's operand read; the
            # per-channel (output-dim) scale applies to the f32 logits.
            logits = jnp.dot(h, params["lm_head"].astype(h.dtype),
                             preferred_element_type=jnp.float32)
            return logits * scale
        return jnp.dot(h, params["lm_head"],
                       preferred_element_type=jnp.float32)
