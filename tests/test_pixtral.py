# SPDX-License-Identifier: Apache-2.0
"""Pixtral (Mistral ViT with 2-D RoPE + Mistral decoder) vs HF transformers.

The reference REFUSES Pixtral ("Pixtral is not yet supported",
vllm_neuron/worker/neuronx_distributed_model_loader.py:672-674; wrapper at
:511-556); serving it here is capability beyond reference parity.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_pixtral_dir(tmp_path_factory):
    import torch
    from transformers import (LlavaConfig, LlavaForConditionalGeneration,
                              MistralConfig, PixtralVisionConfig)

    torch.manual_seed(7)
    vision = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=64, patch_size=8,
        head_dim=16, rope_theta=10000.0)
    text = MistralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    cfg = LlavaConfig(vision_config=vision.to_dict(),
                      text_config=text.to_dict(),
                      image_token_index=300,
                      vision_feature_layer=-1,
                      vision_feature_select_strategy="full")
    model = LlavaForConditionalGeneration(cfg)
    path = tmp_path_factory.mktemp("tiny_pixtral")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_vision_tower_matches_hf(tiny_pixtral_dir):
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    hf = LlavaForConditionalGeneration.from_pretrained(
        tiny_pixtral_dir, torch_dtype=torch.float32)
    hf.eval()
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = np.asarray(hf.get_image_features(
            pixel_values=torch.tensor(pixels),
            image_sizes=torch.tensor([[32, 48], [32, 48]])))

    import jax.numpy as jnp

    from vllm_neuron_tpu.models.pixtral_vision import PixtralVisionEncoder

    cfg = AutoConfig.from_pretrained(tiny_pixtral_dir)
    enc = PixtralVisionEncoder(cfg, jnp.float32)
    params = enc.load_params(tiny_pixtral_dir)
    got = np.asarray(enc.forward(params, jnp.asarray(pixels)))
    # HF packs the batch into one [total_patches, hidden] sequence; ours is
    # [B, patches, hidden] in the same raster order.
    np.testing.assert_allclose(got.reshape(-1, got.shape[-1]),
                               np.asarray(ref).reshape(got.shape[0] *
                                                       got.shape[1], -1),
                               atol=2e-4, rtol=2e-3)


def test_registry_routes_pixtral_vision(tiny_pixtral_dir):
    import jax.numpy as jnp
    from transformers import AutoConfig

    from vllm_neuron_tpu.models.pixtral_vision import PixtralVisionEncoder
    from vllm_neuron_tpu.models.registry import VISION_REGISTRY

    cfg = AutoConfig.from_pretrained(tiny_pixtral_dir)
    enc = VISION_REGISTRY["LlavaForConditionalGeneration"](cfg, jnp.float32)
    assert isinstance(enc, PixtralVisionEncoder)


def test_multimodal_greedy_matches_hf(tiny_pixtral_dir):
    """End-to-end Pixtral generation through the engine (2-D-RoPE ViT
    features merged at [IMG] rows) reproduces HF greedy."""
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_pixtral_dir)
    img_tok = cfg.image_token_index
    n_img_tokens = (32 // 8) * (32 // 8)
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    prompt = [7, 8] + [img_tok] * n_img_tokens + [9, 10, 11]

    hf = LlavaForConditionalGeneration.from_pretrained(
        tiny_pixtral_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(pixels),
            image_sizes=torch.tensor([[32, 32]]),
            attention_mask=torch.ones((1, len(prompt)), dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tiny_pixtral_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    got = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": pixels}},
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
    )[0].outputs[0].token_ids
    assert got[:len(ref)] == ref, f"{got} vs {ref}"


def test_text_only_pixtral_serves_as_mistral(tiny_pixtral_dir):
    """A Pixtral composite with no image request runs the plain Mistral
    decoder path."""
    import torch
    from transformers import LlavaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    prompt = [5, 6, 7, 8]
    hf = LlavaForConditionalGeneration.from_pretrained(
        tiny_pixtral_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones((1, len(prompt)), dtype=torch.long),
            max_new_tokens=6, do_sample=False, num_beams=1)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tiny_pixtral_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    got = llm.generate({"prompt_token_ids": prompt},
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))[0].outputs[0].token_ids
    assert list(got) == ref, f"{got} vs {ref}"
