# SPDX-License-Identifier: Apache-2.0
"""Model-family coverage vs HF oracles: Qwen3 dense (per-head q/k norm) and
Mistral (sliding-window attention masking)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_qwen3_dir(tmp_path_factory):
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(4)
    cfg = Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False)
    model = Qwen3ForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_qwen3")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_mistral_dir(tmp_path_factory):
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(6)
    cfg = MistralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        sliding_window=16,  # shorter than the prompts: exercises the mask
        tie_word_embeddings=False)
    model = MistralForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_mistral")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_qwen3_greedy_matches_hf(tiny_qwen3_dir):
    llm = LLM(model=tiny_qwen3_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    prompts = [[5, 77, 301, 44, 12], [401, 3, 3, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * 2)
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_qwen3_dir, p, 10)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"


def test_mistral_sliding_window_matches_hf(tiny_mistral_dir):
    """Prompt (40 tokens) exceeds the 16-token sliding window, so the
    windowed mask actively changes attention for later positions."""
    llm = LLM(model=tiny_mistral_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    model = llm.engine.worker.model_runner.model
    assert model.sliding_window == 16, "config did not plumb the window"
    prompt = list(range(40, 80))
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    ref = hf_greedy(tiny_mistral_dir, prompt, 12)
    got = out.outputs[0].token_ids[:len(ref)]
    assert got == ref, f"{got} vs {ref}"


@pytest.fixture(scope="module")
def tiny_llama31_dir(tmp_path_factory):
    """Llama-3.1-style checkpoint: rope_scaling rope_type=llama3 (the
    frequency-banded scaling every 3.1/3.3 checkpoint ships with)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(21)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_llama31")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_llama31_rope_scaling_matches_hf(tiny_llama31_dir):
    """Positions past original_max exercise all three frequency bands
    (ops/rope.py llama3 branch) — greedy must track HF exactly."""
    from vllm_neuron_tpu import LLM, SamplingParams
    from tests.conftest import hf_greedy

    llm = LLM(model=tiny_llama31_dir, dtype="float32", max_model_len=256,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    prompts = [[5, 77, 301, 44, 12], list(range(100, 220))]  # crosses 64
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * 2)
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_llama31_dir, p, 10)
        assert out.outputs[0].token_ids[:len(ref)] == ref


@pytest.fixture(scope="module")
def tiny_yarn_dir(tmp_path_factory):
    """Long-context Qwen-2.5-style checkpoint: rope_type=yarn (frequency
    interpolation + attention_scaling on cos/sin)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(23)
    cfg = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=100000.0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 128},
        tie_word_embeddings=False)
    model = Qwen2ForCausalLM(cfg)
    path = tmp_path_factory.mktemp("tiny_yarn")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_yarn_rope_matches_hf(tiny_yarn_dir):
    """YaRN inv_freq bands + attention_scaling (ops/rope.py) — greedy
    must track HF exactly past the original context length."""
    from vllm_neuron_tpu import LLM, SamplingParams
    from tests.conftest import hf_greedy

    llm = LLM(model=tiny_yarn_dir, dtype="float32", max_model_len=256,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    prompts = [[5, 77, 301, 44, 12], list(range(100, 240))]  # crosses 128
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * 2)
    for p, out in zip(prompts, outs):
        ref = hf_greedy(tiny_yarn_dir, p, 10)
        assert out.outputs[0].token_ids[:len(ref)] == ref, \
            f"{out.outputs[0].token_ids} vs {ref}"


def test_yarn_without_original_max_falls_back(tmp_path):
    """HF treats original_max_position_embeddings as optional (falls back
    to max_position_embeddings) — regression for a load-time KeyError."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from vllm_neuron_tpu import LLM, SamplingParams
    from tests.conftest import hf_greedy

    torch.manual_seed(29)
    cfg = Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=100000.0,
        rope_scaling={"rope_type": "yarn", "factor": 2.0},
        tie_word_embeddings=False)
    d = str(tmp_path / "yarn_nomax")
    Qwen2ForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    p = [5, 77, 301, 44, 12]
    out = llm.generate({"prompt_token_ids": p},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    assert list(out.outputs[0].token_ids) == hf_greedy(d, p, 8)
