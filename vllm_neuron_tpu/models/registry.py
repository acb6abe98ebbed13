# SPDX-License-Identifier: Apache-2.0
"""Architecture -> model-class resolution (TPU-native analogue of the
reference's `_get_neuron_model_cls` registry walk,
vllm_neuron/worker/neuronx_distributed_model_loader.py:634-659)."""
from __future__ import annotations

from vllm_neuron_tpu.config import EngineConfig


def _llama(config):
    from vllm_neuron_tpu.models.llama import LlamaForCausalLM
    return LlamaForCausalLM(config.model, config.quant)


def _qwen3_moe(config):
    from vllm_neuron_tpu.models.qwen3_moe import Qwen3MoeForCausalLM
    return Qwen3MoeForCausalLM(config.model, config.quant)


def _llama4(config):
    from vllm_neuron_tpu.models.llama4 import Llama4ForCausalLM
    return Llama4ForCausalLM(config.model, config.quant)


# Llama-architecture dense models all share one implementation (Qwen2's QKV
# bias and Qwen3's q/k-norm are config-driven deltas inside LlamaForCausalLM).
MODEL_REGISTRY = {
    "LlamaForCausalLM": _llama,
    "Qwen2ForCausalLM": _llama,
    "Qwen3ForCausalLM": _llama,
    "MistralForCausalLM": _llama,
    "Qwen3MoeForCausalLM": _qwen3_moe,
    "Llama4ForCausalLM": _llama4,
    "Llama4ForConditionalGeneration": _llama4,
}


def get_model(config: EngineConfig):
    arch = config.model.architecture
    try:
        factory = MODEL_REGISTRY[arch]
    except KeyError:
        raise ValueError(
            f"unsupported architecture {arch!r}; supported: "
            f"{sorted(MODEL_REGISTRY)}") from None
    return factory(config)


def supported_architectures() -> list[str]:
    return sorted(MODEL_REGISTRY)
