# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA adapter registry + PEFT checkpoint loading.

The reference stack's LoRA surface is interface-only (NotImplementedError at
runtime: reference vllm_neuron/worker/neuron_worker.py:123-138 — SURVEY.md
V9); this is a working TPU-native implementation. Adapters are registered at
engine construction (the vLLM ``--lora-modules name=path`` model), loaded
from standard PEFT checkpoints (``adapter_config.json`` +
``adapter_model.safetensors``), and stacked per target projection into

    params["lora"]["layers"][target] = {"a": [L, G, in, r], "b": [L, G, r, out]}

with adapter slot 0 all-zeros ("no adapter") so the stack rides the model's
layer ``lax.scan`` unchanged and one static program serves any mix of
adapters per batch (ops/lora.py). Ranks are zero-padded to the registry max;
the PEFT scale (alpha/r, or alpha/sqrt(r) under rslora) is folded into B.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

# PEFT module name -> internal projection name (models/llama.py layer keys).
_TARGET_MAP = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "wg",
    "up_proj": "wu",
    "down_proj": "wd",
}
# Input/output dims per internal target, as functions of the model.
def _target_dims(model, name: str) -> tuple[int, int]:
    H = model.hidden_size
    qd = model.num_heads * model.head_dim
    kvd = model.num_kv_heads * model.head_dim
    I = model.intermediate_size
    return {
        "wq": (H, qd), "wk": (H, kvd), "wv": (H, kvd), "wo": (qd, H),
        "wg": (H, I), "wu": (H, I), "wd": (I, H),
    }[name]


class LoRARequest:
    """Names a registered adapter for one request (vLLM-compatible shape)."""

    def __init__(self, lora_name: str, lora_int_id: int = 0,
                 lora_path: str = ""):
        self.lora_name = lora_name
        self.lora_int_id = lora_int_id
        self.lora_path = lora_path


def _read_adapter(path: str):
    """Returns (config dict, {key: np.ndarray})."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    tensors = {}
    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors import safe_open
        with safe_open(st, framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    else:  # .bin fallback
        import torch
        blob = torch.load(os.path.join(path, "adapter_model.bin"),
                          map_location="cpu", weights_only=True)
        tensors = {k: v.float().numpy() for k, v in blob.items()}
    return cfg, tensors


def _parse_key(key: str) -> Optional[tuple[int, str, str]]:
    """'base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight'
    -> (3, 'q_proj', 'A'); None for keys we don't serve."""
    parts = key.split(".")
    if "layers" not in parts or "weight" != parts[-1]:
        return None
    li = parts.index("layers")
    layer = int(parts[li + 1])
    ab = parts[-2]  # lora_A / lora_B
    if ab not in ("lora_A", "lora_B"):
        return None
    module = parts[-3]
    if module not in _TARGET_MAP:
        logger.warning("LoRA target %r not served on the fused path; "
                       "ignoring %s", module, key)
        return None
    return layer, module, ab[-1]


class LoRAAdapterSet:
    """All adapters registered for one engine, stacked for the scan."""

    def __init__(self, model, adapters: dict[str, str], dtype):
        """adapters: {name: peft_checkpoint_dir}; ids are 1..K in insertion
        order (0 = base model)."""
        self.names = list(adapters)
        self.name_to_id = {n: i + 1 for i, n in enumerate(self.names)}
        self.num_groups = 1 + len(self.names)
        L = model.num_layers

        loaded = []  # (id, scale, {(layer, target, 'A'|'B'): array})
        max_r = 1
        targets: set[str] = set()
        for name in self.names:
            cfg, tensors = _read_adapter(adapters[name])
            r = int(cfg.get("r", 8))
            alpha = float(cfg.get("lora_alpha", r))
            scale = (alpha / np.sqrt(r) if cfg.get("use_rslora")
                     else alpha / r)
            max_r = max(max_r, r)
            per = {}
            for key, t in tensors.items():
                parsed = _parse_key(key)
                if parsed is None:
                    continue
                layer, module, ab = parsed
                tgt = _TARGET_MAP[module]
                targets.add(tgt)
                per[(layer, tgt, ab)] = t
            loaded.append((self.name_to_id[name], scale, per))
        self.max_rank = max_r
        self.targets = sorted(targets)

        # Stack: zeros everywhere, fill registered slots.
        import jax.numpy as jnp
        G, R = self.num_groups, self.max_rank
        stacks = {}
        for tgt in self.targets:
            din, dout = _target_dims(model, tgt)
            a = np.zeros((L, G, din, R), np.float32)
            b = np.zeros((L, G, R, dout), np.float32)
            for gid, scale, per in loaded:
                for l in range(L):
                    ta = per.get((l, tgt, "A"))  # PEFT: [r, in]
                    tb = per.get((l, tgt, "B"))  # PEFT: [out, r]
                    if ta is None or tb is None:
                        continue
                    r = ta.shape[0]
                    a[l, gid, :, :r] = ta.T.astype(np.float32)
                    b[l, gid, :r, :] = tb.T.astype(np.float32) * scale
            stacks[tgt] = {"a": jnp.asarray(a, dtype),
                           "b": jnp.asarray(b, dtype)}
        self.params = {"layers": stacks}
        logger.info(
            "loaded %d LoRA adapter(s): %s (targets=%s, max_rank=%d)",
            len(self.names), self.names, self.targets, self.max_rank)

    def resolve(self, lora) -> int:
        """Map a request's adapter (name / LoRARequest / None) to a group
        id; raises KeyError on unknown names."""
        if lora is None:
            return 0
        name = lora.lora_name if isinstance(lora, LoRARequest) else str(lora)
        if name not in self.name_to_id:
            raise KeyError(f"unknown LoRA adapter {name!r}; registered: "
                           f"{self.names}")
        return self.name_to_id[name]
