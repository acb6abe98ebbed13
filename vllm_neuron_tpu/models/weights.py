# SPDX-License-Identifier: Apache-2.0
"""HF-safetensors checkpoint loading into layer-stacked JAX param trees.

The param layout is TPU-first: every per-layer weight is stacked along a
leading layer axis so the decoder runs as one ``lax.scan`` (one XLA while loop
instead of L inlined layers — far faster compiles, identical runtime), and all
matmul weights are stored ``[in, out]`` so the hot path is ``x @ W`` with no
transposes.
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Callable, Optional

import numpy as np

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)


def iter_safetensors(model_dir: str):
    """Yield (name, np.ndarray) for every tensor in the checkpoint dir,
    following the index file when the checkpoint is sharded."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        files = [os.path.join(model_dir, f) for f in files]
    else:
        files = sorted(glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    for path in files:
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def safetensors_names(model_dir: str) -> list[str]:
    """All tensor names in the checkpoint dir WITHOUT reading any data."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            return list(json.load(f)["weight_map"].keys())
    names: list[str] = []
    for path in sorted(glob(os.path.join(model_dir, "*.safetensors"))):
        with safe_open(path, framework="numpy") as f:
            names.extend(f.keys())
    return names


def _to_np_dtype(dtype) -> np.dtype:
    import jax.numpy as jnp
    return np.dtype(jnp.dtype(dtype))


class StackingLoader:
    """Collects per-layer HF tensors and emits layer-stacked arrays.

    ``register(hf_template, dest, transform)`` maps an HF tensor name pattern
    (with ``{i}`` for the layer index) to a destination path in the param tree.
    """

    def __init__(self, num_layers: int, dtype):
        self.num_layers = num_layers
        self.np_dtype = _to_np_dtype(dtype)
        self._layer_rules: list[tuple[str, str, Optional[Callable]]] = []
        self._global_rules: dict[str, tuple[str, Optional[Callable]]] = {}
        self._store: dict[str, list] = {}
        self._globals: dict[str, np.ndarray] = {}

    def register_layer(self, hf_template: str, dest: str,
                       transform: Optional[Callable] = None):
        prefix, suffix = hf_template.split("{i}")
        self._layer_rules.append((prefix, suffix, dest, transform))
        # Multiple templates may feed one dest (checkpoint name variants).
        self._store.setdefault(dest, [None] * self.num_layers)

    def register(self, hf_name: str, dest: str,
                 transform: Optional[Callable] = None):
        self._global_rules[hf_name] = (dest, transform)

    def consume(self, name: str, tensor: np.ndarray) -> bool:
        if name in self._global_rules:
            dest, transform = self._global_rules[name]
            t = tensor.astype(self.np_dtype)
            if transform is not None:
                t = transform(t)
            self._globals[dest] = t
            return True
        for prefix, suffix, dest, transform in self._layer_rules:
            if name.startswith(prefix) and name.endswith(suffix):
                mid = name[len(prefix):len(name) - len(suffix)]
                if not mid.isdigit():
                    continue
                i = int(mid)
                t = tensor.astype(self.np_dtype)
                if transform is not None:
                    t = transform(t)
                self._store[dest][i] = t
                return True
        return False

    def finalize(self, allow_missing: Optional[set] = None) -> dict:
        """``allow_missing`` names resolve to None when absent from the
        checkpoint (e.g. an Eagle draft without its own embeddings)."""
        allow_missing = allow_missing or set()
        layers = {}
        for dest, tensors in self._store.items():
            missing = [i for i, t in enumerate(tensors) if t is None]
            if missing:
                if dest in allow_missing and len(missing) == len(tensors):
                    continue
                raise ValueError(f"missing layer tensors for {dest!r}: "
                                 f"layers {missing[:8]}...")
            layers[dest] = np.stack(tensors, axis=0)
        out = dict(self._globals)
        for name in allow_missing:
            out.setdefault(name, None)
        out["layers"] = layers
        return out


def transpose(t: np.ndarray) -> np.ndarray:
    """HF linear weights are [out, in]; we store [in, out]."""
    return np.ascontiguousarray(t.T)
