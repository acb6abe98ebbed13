# SPDX-License-Identifier: Apache-2.0
"""vllm_neuron_tpu: a TPU-native LLM inference & serving framework
(JAX / XLA / Pallas / pjit) with the capability set of
vllm-project/vllm-neuron, built from scratch."""

__version__ = "0.1.0"

from vllm_neuron_tpu.engine.llm import LLM  # noqa: F401
from vllm_neuron_tpu.engine.outputs import (CompletionOutput,  # noqa: F401
                                            RequestOutput)
from vllm_neuron_tpu.sampling.params import SamplingParams  # noqa: F401

__all__ = ["LLM", "SamplingParams", "RequestOutput", "CompletionOutput"]
