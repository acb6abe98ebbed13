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
    # Llava: CLIP tower (models/llava_vision.py) + plain Llama decoder (the
    # composite-checkpoint prefix is auto-detected by the loader).
    "LlavaForConditionalGeneration": _llama,
}


def _mllama(config):
    from vllm_neuron_tpu.models.mllama import MllamaForCausalLM
    return MllamaForCausalLM(config.model, config.quant)


MODEL_REGISTRY["MllamaForConditionalGeneration"] = _mllama
MODEL_REGISTRY["MllamaForCausalLM"] = _mllama  # text-only checkpoints


def _llava_vision(hf_config, dtype):
    # Llava composites carry either a CLIP tower or (Pixtral checkpoints) a
    # Mistral ViT with 2-D RoPE; dispatch on the nested vision model_type.
    # The reference gates the Pixtral class off entirely
    # (neuronx_distributed_model_loader.py:672-674); here it is served.
    vc = getattr(hf_config, "vision_config", None)
    if vc is not None and getattr(vc, "model_type", "") == "pixtral":
        from vllm_neuron_tpu.models.pixtral_vision import \
            PixtralVisionEncoder
        return PixtralVisionEncoder(hf_config, dtype)
    from vllm_neuron_tpu.models.llava_vision import LlavaVisionEncoder
    return LlavaVisionEncoder(hf_config, dtype)


def _llama4_vision(hf_config, dtype):
    from vllm_neuron_tpu.models.llama4_vision import Llama4VisionEncoder
    return Llama4VisionEncoder(hf_config, dtype)


def _mllama_vision(hf_config, dtype):
    from vllm_neuron_tpu.models.mllama import MllamaVisionEncoder
    return MllamaVisionEncoder(hf_config, dtype)


# Architecture -> separate vision-tower graph (reference analogue: the
# vision_neuron_config split, neuronx_distributed_model_loader.py:421-440).
VISION_REGISTRY = {
    "Llama4ForConditionalGeneration": _llama4_vision,
    "LlavaForConditionalGeneration": _llava_vision,
    "MllamaForConditionalGeneration": _mllama_vision,
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
