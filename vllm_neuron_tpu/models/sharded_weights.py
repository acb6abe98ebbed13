# SPDX-License-Identifier: Apache-2.0
"""Lazy, shard-aware checkpoint loading for multi-host (and huge) models.

The eager loader (models/weights.py) materializes every stacked tensor in
host memory before sharding — fine on one host, impossible for a 70B model
on a pod slice (the reference's analogue is NxDI's save_sharded_checkpoint
per-TP-rank weight shards, SURVEY.md §5 checkpoint/caches). This module
instead builds each device array with ``jax.make_array_from_callback``:
every host materializes ONLY the slices its local devices own, read
directly from the safetensors files via zero-copy ``get_slice`` range
reads. Peak host memory = one local shard, not the model.

Layout contract matches StackingLoader: per-layer weights stacked on a
leading layer axis, matmul weights stored [in, out] (HF stores [out, in];
the transpose happens per-slice at read time). QKV/gate-up fusion is NOT
applied — the model forward's unfused fallback path handles that — and
quantize-on-load is not supported (use tools/quantize.py to pre-quantize,
or bf16).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from glob import glob
from typing import Optional

import numpy as np

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


def _np_dtype(dtype) -> np.dtype:
    import jax.numpy as jnp
    return np.dtype(jnp.dtype(dtype))


class CheckpointIndex:
    """Maps tensor name -> (file path, shape, dtype) without reading data."""

    def __init__(self, model_dir: str):
        from safetensors import safe_open
        index_path = os.path.join(model_dir,
                                  "model.safetensors.index.json")
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            files = sorted(set(index["weight_map"].values()))
            files = [os.path.join(model_dir, f) for f in files]
        else:
            files = sorted(glob(os.path.join(model_dir, "*.safetensors")))
        if not files:
            raise FileNotFoundError(
                f"no .safetensors files under {model_dir}")
        self._by_name: dict[str, tuple[str, tuple]] = {}
        self._handles: dict[str, object] = {}
        for path in files:
            with safe_open(path, framework="numpy") as f:
                for name in f.keys():
                    shape = tuple(f.get_slice(name).get_shape())
                    self._by_name[name] = (path, shape)

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def shape(self, name: str) -> tuple:
        return self._by_name[name][1]

    def read(self, name: str, key: tuple) -> np.ndarray:
        """Read a slice of a tensor (range reads only — no full load)."""
        from safetensors import safe_open
        path, _ = self._by_name[name]
        h = self._handles.get(path)
        if h is None:
            h = safe_open(path, framework="numpy")
            self._handles[path] = h
        return h.get_slice(name)[key]


@dataclass
class _LayerRule:
    template: str      # HF name with {i}
    transpose: bool


class LazyShardedLoader:
    """Builds sharded param trees with per-shard lazy reads.

    register_layer/register mirror StackingLoader's API (minus arbitrary
    transforms: only the [out,in]->[in,out] transpose, which commutes with
    slicing).
    """

    def __init__(self, model_dir: str, num_layers: int, dtype, mesh,
                 specs_for):
        self.index = CheckpointIndex(model_dir)
        self.num_layers = num_layers
        self.np_dtype = _np_dtype(dtype)
        self.mesh = mesh
        self.specs_for = specs_for  # name -> PartitionSpec resolver
        self._layer: dict[str, _LayerRule] = {}
        self._global: dict[str, tuple[str, bool]] = {}

    def register_layer(self, hf_template: str, dest: str,
                       transpose: bool = False):
        if hf_template.format(i=0) in self.index:
            self._layer[dest] = _LayerRule(hf_template, transpose)

    def register(self, hf_name: str, dest: str, transpose: bool = False):
        if hf_name in self.index:
            self._global[dest] = (hf_name, transpose)

    # -- materialization ------------------------------------------------

    def _make(self, shape, spec, cb):
        import jax
        from jax.sharding import NamedSharding
        sharding = NamedSharding(self.mesh, spec)
        return jax.make_array_from_callback(tuple(shape), sharding, cb)

    def _load_layer_stack(self, dest: str, rule: _LayerRule):
        name0 = rule.template.format(i=0)
        hf_shape = self.index.shape(name0)
        if rule.transpose:
            base_shape = tuple(reversed(hf_shape))
        else:
            base_shape = hf_shape
        shape = (self.num_layers,) + base_shape
        spec = self.specs_for(dest, len(shape))

        def cb(idx):
            # idx: tuple of slices into [L, *base_shape].
            lsl = idx[0]
            rest = idx[1:]
            if rule.transpose:
                key = tuple(reversed(rest))
            else:
                key = rest
            outs = []
            for i in range(*lsl.indices(self.num_layers)):
                t = self.index.read(rule.template.format(i=i), key)
                if rule.transpose:
                    t = t.T
                outs.append(np.ascontiguousarray(t, self.np_dtype))
            return np.stack(outs, axis=0)

        arr = self._make(shape, spec, cb)
        return arr

    def _load_global(self, dest: str, hf_name: str, transpose: bool):
        hf_shape = self.index.shape(hf_name)
        shape = tuple(reversed(hf_shape)) if transpose else hf_shape
        spec = self.specs_for(dest, len(shape))

        def cb(idx):
            key = tuple(reversed(idx)) if transpose else idx
            t = self.index.read(hf_name, key)
            if transpose:
                t = t.T
            return np.ascontiguousarray(t, self.np_dtype)

        return self._make(shape, spec, cb)

    def finalize(self) -> dict:
        layers = {}
        for dest, rule in self._layer.items():
            layers[dest] = self._load_layer_stack(dest, rule)
            logger.info("lazily sharded %s: %s", dest,
                        tuple(layers[dest].shape))
        out = {}
        for dest, (hf_name, tr) in self._global.items():
            out[dest] = self._load_global(dest, hf_name, tr)
        out["layers"] = layers
        return out


def load_llama_sharded(model, model_dir: str, mesh) -> dict:
    """Sharded lazy load for the dense Llama/Qwen family (the stacked-layout
    subset of LlamaModel.load_params; vision/MoE families fall back to the
    eager loader)."""
    from jax.sharding import PartitionSpec as P

    from vllm_neuron_tpu.parallel.sharding import (LAYER_PARAM_SPECS,
                                                   TOP_PARAM_SPECS,
                                                   _divisible)
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS

    tp = mesh.shape[MODEL_AXIS]

    def specs_for(dest: str, ndim: int):
        return LAYER_PARAM_SPECS.get(dest, TOP_PARAM_SPECS.get(dest, P()))

    ld = LazyShardedLoader(model_dir, model.num_layers, model.dtype, mesh,
                           specs_for)

    # Apply the GQA/divisibility replication fallback with the real shape.
    orig_make = ld._make

    def make(shape, spec, cb):
        return orig_make(shape, _divisible(spec, shape, tp), cb)

    ld._make = make

    L = "model.layers.{i}."
    ld.register_layer(L + "input_layernorm.weight", "attn_norm")
    ld.register_layer(L + "post_attention_layernorm.weight", "mlp_norm")
    ld.register_layer(L + "self_attn.q_proj.weight", "wq", transpose=True)
    ld.register_layer(L + "self_attn.k_proj.weight", "wk", transpose=True)
    ld.register_layer(L + "self_attn.v_proj.weight", "wv", transpose=True)
    ld.register_layer(L + "self_attn.o_proj.weight", "wo", transpose=True)
    ld.register_layer(L + "mlp.gate_proj.weight", "wg", transpose=True)
    ld.register_layer(L + "mlp.up_proj.weight", "wu", transpose=True)
    ld.register_layer(L + "mlp.down_proj.weight", "wd", transpose=True)
    if model.qkv_bias:
        ld.register_layer(L + "self_attn.q_proj.bias", "bq")
        ld.register_layer(L + "self_attn.k_proj.bias", "bk")
        ld.register_layer(L + "self_attn.v_proj.bias", "bv")
    if model.qk_norm:
        ld.register_layer(L + "self_attn.q_norm.weight", "q_norm")
        ld.register_layer(L + "self_attn.k_norm.weight", "k_norm")
    ld.register("model.embed_tokens.weight", "embed")
    ld.register("model.norm.weight", "final_norm")
    if not model.tie_embeddings:
        ld.register("lm_head.weight", "lm_head", transpose=True)
    params = ld.finalize()
    if model.tie_embeddings:
        # Tied head: reuse the (replicated) embedding, transposed lazily
        # would force a full read; embed is replicated anyway so transpose
        # on device.
        import jax.numpy as jnp
        params["lm_head"] = jnp.transpose(params["embed"])
    return params


def load_prequantized_sharded(model, model_dir: str, mesh):
    """Lazy sharded load of a tools/quantize.py PRE-QUANTIZED checkpoint
    (the 70B-class path: quantize once on a big host, then every serving
    host range-reads only its own shards — fp8/int8/int4 weights + scales;
    reference analogue: NxDI save_quantized_state_dict + per-rank shards,
    model_loader.py:238-240). Returns None when the directory is not a
    pre-quantized checkpoint.

    The quantized file stores the model's OWN stacked layout (flat
    dot-joined keys), so no HF-name mapping or transposes are needed —
    each tensor is sliced directly with its at-rest sharding spec.
    Non-standard dtypes (bf16 embed, fp8 weights) are stored as uint views
    with the true dtype in the manifest; views reinterpret per slice."""
    from vllm_neuron_tpu.tools.quantize import (MANIFEST, _restore_dtype)
    manifest_path = os.path.join(model_dir, MANIFEST)
    if not os.path.exists(manifest_path):
        return None
    with open(manifest_path) as f:
        manifest = json.load(f)
    tensor_dtypes = manifest.get("tensor_dtypes", {})

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from safetensors import safe_open

    from vllm_neuron_tpu.parallel.mesh import EXPERT_AXIS, MODEL_AXIS
    from vllm_neuron_tpu.parallel.sharding import (LAYER_PARAM_SPECS,
                                                   TOP_PARAM_SPECS,
                                                   _divisible)
    tp = mesh.shape[MODEL_AXIS]
    ep = mesh.shape.get(EXPERT_AXIS, 1)
    path = os.path.join(model_dir, "quantized.safetensors")
    handle = safe_open(path, framework="numpy")

    def load_one(key: str) -> jax.Array:
        sl = handle.get_slice(key)
        shape = tuple(sl.get_shape())
        leaf = key.split(".")[-1]
        spec = LAYER_PARAM_SPECS.get(leaf, TOP_PARAM_SPECS.get(leaf, P()))
        spec = P(*spec[:len(shape)]) if len(spec) > len(shape) else spec
        spec = _divisible(spec, shape, tp, ep)
        true_dtype = tensor_dtypes.get(key)

        def cb(idx):
            t = handle.get_slice(key)[idx]
            return np.ascontiguousarray(_restore_dtype(t, true_dtype))

        arr = jax.make_array_from_callback(
            shape, NamedSharding(mesh, spec), cb)
        return arr

    flat = {}
    for key in handle.keys():
        flat[key] = load_one(key)
        logger.info("lazily sharded prequantized %s: %s", key,
                    tuple(flat[key].shape))
    from vllm_neuron_tpu.tools.quantize import _unflatten
    params = _unflatten(flat)
    if getattr(model, "tie_embeddings", False) and "lm_head" not in params:
        params["lm_head"] = jnp.transpose(params["embed"])
    return params
