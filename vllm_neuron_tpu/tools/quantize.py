# SPDX-License-Identifier: Apache-2.0
"""Quantize-once-and-save tool (reference analogue: NxDI
``save_quantized_state_dict``, vllm_neuron/worker/
neuronx_distributed_model_loader.py:238-240).

Loads an HF checkpoint, quantizes the decoder projections per channel, and
saves the framework's stacked param layout to ``<out>/`` with a manifest.
Engines pointed at the output directory load the pre-quantized weights
directly (no re-quantization at startup).

Usage:
  python -m vllm_neuron_tpu.tools.quantize --model <hf_dir> \
      --output <dir> --quantization int8 [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

MANIFEST = "vllm_neuron_tpu_quant.json"

# safetensors' numpy framework rejects ml_dtypes (bfloat16, float8_*):
# non-standard dtypes are stored as same-itemsize uint views with the true
# dtype recorded in the manifest ("tensor_dtypes"). Shapes are unchanged,
# so lazy range reads (models/sharded_weights.py) slice the view and
# reinterpret per slice.
_VIEW_FOR = {"bfloat16": "uint16", "float8_e4m3fn": "uint8",
             "float8_e5m2": "uint8"}


def _to_savable(arr: np.ndarray) -> tuple[np.ndarray, str | None]:
    name = arr.dtype.name
    if name in _VIEW_FOR:
        return arr.view(_VIEW_FOR[name]), name
    return arr, None


def _restore_dtype(arr: np.ndarray, dtype_name: str | None) -> np.ndarray:
    if dtype_name is None:
        return arr
    import ml_dtypes  # noqa: F401  (registers the dtypes)
    return arr.view(dtype_name)


def _flatten(tree: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "."))
        elif v is not None:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def quantize_and_save(model_dir: str, output_dir: str, quantization: str,
                      dtype: str = "bfloat16") -> None:
    from safetensors.numpy import save_file

    from vllm_neuron_tpu.config import ModelConfig, QuantConfig
    from vllm_neuron_tpu.models.registry import MODEL_REGISTRY

    model_config = ModelConfig(model=model_dir, dtype=dtype)
    quant_config = QuantConfig(quantization=quantization)

    class _Cfg:
        model = model_config
        quant = quant_config

    arch = model_config.architecture
    model = MODEL_REGISTRY[arch](_Cfg)
    params = model.load_params(model_dir)  # quantizes during load
    flat = _flatten(jax_to_numpy(params))
    tensor_dtypes = {}
    for k in list(flat):
        flat[k], true_dtype = _to_savable(flat[k])
        if true_dtype:
            tensor_dtypes[k] = true_dtype
    os.makedirs(output_dir, exist_ok=True)
    save_file(flat, os.path.join(output_dir, "quantized.safetensors"))
    with open(os.path.join(output_dir, MANIFEST), "w") as f:
        json.dump({
            "quantization": quantization,
            "dtype": dtype,
            "architecture": arch,
            "source": os.path.abspath(model_dir),
            "tensor_dtypes": tensor_dtypes,
        }, f, indent=2)
    # The HF config rides along so the output dir is self-contained.
    model_config.hf_config.save_pretrained(output_dir)
    print(f"saved quantized checkpoint ({quantization}) to {output_dir}")


def jax_to_numpy(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def load_prequantized(model_dir: str) -> dict | None:
    """Load a checkpoint produced by this tool; None if not one."""
    path = os.path.join(model_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    import jax
    from safetensors.numpy import load_file

    with open(path) as f:
        manifest = json.load(f)
    tensor_dtypes = manifest.get("tensor_dtypes", {})
    flat = load_file(os.path.join(model_dir, "quantized.safetensors"))
    flat = {k: _restore_dtype(v, tensor_dtypes.get(k))
            for k, v in flat.items()}
    return jax.tree.map(jax.numpy.asarray, _unflatten(flat))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--quantization", required=True,
                   choices=["int8", "fp8", "int4"])
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    quantize_and_save(args.model, args.output, args.quantization,
                      args.dtype)


if __name__ == "__main__":
    main()
