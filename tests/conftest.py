# SPDX-License-Identifier: Apache-2.0
"""Test fixtures.

Tests run on the CPU backend with 8 virtual devices (multi-chip sharding is
validated on a virtual mesh, like the driver's dryrun) and use tiny
randomly-initialized HF checkpoints saved to disk, with torch-CPU
transformers as the greedy/logits oracle — the offline equivalent of the
reference's HF-golden accuracy checks
(test/e2e/online/online_server_runner.py:95-146)."""
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_eagle_dir(tmp_path_factory, tiny_llama_dir):
    """Eagle-style draft checkpoint matching the tiny target's dims:
    fc [H, 2H] + one Llama decoder layer."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, LlamaConfig, LlamaForCausalLM

    target_cfg = AutoConfig.from_pretrained(tiny_llama_dir)
    cfg = LlamaConfig(
        vocab_size=target_cfg.vocab_size,
        hidden_size=target_cfg.hidden_size,
        intermediate_size=target_cfg.intermediate_size,
        num_hidden_layers=1,
        num_attention_heads=target_cfg.num_attention_heads,
        num_key_value_heads=target_cfg.num_key_value_heads,
        max_position_embeddings=target_cfg.max_position_embeddings,
    )
    torch.manual_seed(3)
    model = LlamaForCausalLM(cfg)
    sd = {k: v for k, v in model.state_dict().items()
          if k.startswith("model.layers.0.") and "rotary" not in k}
    H = cfg.hidden_size
    sd["fc.weight"] = torch.randn(H, 2 * H) * 0.02
    path = tmp_path_factory.mktemp("tiny_eagle")
    save_file(sd, str(path / "model.safetensors"))
    cfg.save_pretrained(path)
    return str(path)


@pytest.fixture(scope="session")
def tiny_llama_dir(tmp_path_factory):
    """Tiny random HF Llama checkpoint (float32, GQA) saved to disk."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="session")
def tiny_qwen2_dir(tmp_path_factory):
    """Tiny random HF Qwen2 checkpoint (QKV biases exercise that path)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    cfg = Qwen2Config(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_qwen2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir: str, prompt_ids: list[int],
              max_new_tokens: int) -> list[int]:
    """HF transformers greedy continuation (the accuracy oracle)."""
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=max_new_tokens,
                             do_sample=False, num_beams=1)
    return out[0, len(prompt_ids):].tolist()


def hf_logits(model_dir: str, prompt_ids: list[int]) -> np.ndarray:
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([prompt_ids], dtype=torch.long))
    return out.logits[0].float().numpy()
