# SPDX-License-Identifier: Apache-2.0
"""Llama-4 vision tower vs HF transformers (CPU oracle).

Reference capability: separate vision graph + image-embedding merge
(vllm_neuron/worker/neuronx_distributed_model_loader.py:421-440, :596-601).
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_llama4_mm_dir(tmp_path_factory):
    import torch
    from transformers import (Llama4Config, Llama4TextConfig,
                              Llama4VisionConfig,
                              Llama4ForConditionalGeneration)

    torch.manual_seed(11)
    text = Llama4TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=64,
        intermediate_size_mlp=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=2, num_experts_per_tok=1,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    # Constraint: hidden_size / pixel_shuffle_ratio^2 == intermediate_size
    # (the adapter fc1 input), and projector_input == projector_output ==
    # vision_output_dim.
    vision = Llama4VisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        pixel_shuffle_ratio=0.5, projector_input_dim=128,
        projector_output_dim=128, vision_output_dim=128,
    )
    cfg = Llama4Config(vision_config=vision.to_dict(),
                       text_config=text.to_dict(),
                       image_token_index=200)
    model = Llama4ForConditionalGeneration(cfg)
    path = tmp_path_factory.mktemp("tiny_llama4_mm")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_vision_tower_matches_hf(tiny_llama4_mm_dir):
    import torch
    from transformers import Llama4ForConditionalGeneration

    hf = Llama4ForConditionalGeneration.from_pretrained(
        tiny_llama4_mm_dir, torch_dtype=torch.float32)
    hf.eval()
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        feats = hf.get_image_features(
            torch.tensor(pixels),
            vision_feature_select_strategy="default")
        ref = np.asarray(
            hf.multi_modal_projector(feats.view(-1, feats.size(-1))))

    from transformers import AutoConfig

    from vllm_neuron_tpu.models.llama4_vision import Llama4VisionEncoder
    import jax.numpy as jnp

    cfg = AutoConfig.from_pretrained(tiny_llama4_mm_dir)
    enc = Llama4VisionEncoder(cfg, jnp.float32)
    params = enc.load_params(tiny_llama4_mm_dir)
    got = np.asarray(enc.forward(params, jnp.asarray(pixels)))
    got = got.reshape(ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_multimodal_greedy_matches_hf(tiny_llama4_mm_dir):
    """Full multimodal generation: image embeddings merged at <image> token
    positions must reproduce HF greedy output."""
    import torch
    from transformers import AutoConfig, Llama4ForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_llama4_mm_dir)
    img_tok = cfg.image_token_index
    # 32x32 image, patch 8 -> 16 patches; pixel shuffle 0.5 -> 4 img tokens.
    n_img_tokens = 4
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    prompt = [7, 8] + [img_tok] * n_img_tokens + [9, 10, 11]

    hf = Llama4ForConditionalGeneration.from_pretrained(
        tiny_llama4_mm_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.ones((1, len(prompt)), dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tiny_llama4_mm_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    got = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": pixels}},
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
    )[0].outputs[0].token_ids
    assert got[:len(ref)] == ref, f"{got} vs {ref}"
