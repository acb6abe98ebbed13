# SPDX-License-Identifier: Apache-2.0
"""Llava (CLIP tower + Llama decoder) vs HF transformers (CPU oracle).

Reference capability: Llava family support + vision graph split
(vllm_neuron/worker/constants.py:4-7,
neuronx_distributed_model_loader.py:399-556).
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_llava_dir(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    torch.manual_seed(3)
    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=32)
    text = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    cfg = LlavaConfig(vision_config=vision.to_dict(),
                      text_config=text.to_dict(),
                      image_token_index=300,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    model = LlavaForConditionalGeneration(cfg)
    path = tmp_path_factory.mktemp("tiny_llava")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_vision_tower_matches_hf(tiny_llava_dir):
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    hf = LlavaForConditionalGeneration.from_pretrained(
        tiny_llava_dir, torch_dtype=torch.float32)
    hf.eval()
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = np.asarray(hf.get_image_features(
            pixel_values=torch.tensor(pixels)))

    import jax.numpy as jnp

    from vllm_neuron_tpu.models.llava_vision import LlavaVisionEncoder

    cfg = AutoConfig.from_pretrained(tiny_llava_dir)
    enc = LlavaVisionEncoder(cfg, jnp.float32)
    params = enc.load_params(tiny_llava_dir)
    got = np.asarray(enc.forward(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, ref.reshape(got.shape),
                               atol=2e-4, rtol=2e-3)


def test_multimodal_greedy_matches_hf(tiny_llava_dir):
    """End-to-end Llava generation through the engine (CLIP features merged
    at <image> rows) reproduces HF greedy."""
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_llava_dir)
    img_tok = cfg.image_token_index
    n_img_tokens = (32 // 8)**2  # patches, CLS dropped
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    prompt = [7, 8] + [img_tok] * n_img_tokens + [9, 10, 11]

    hf = LlavaForConditionalGeneration.from_pretrained(
        tiny_llava_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(pixels),
            attention_mask=torch.ones((1, len(prompt)), dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tiny_llava_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    got = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": pixels}},
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
    )[0].outputs[0].token_ids
    assert got[:len(ref)] == ref, f"{got} vs {ref}"


def test_raw_image_processor_integration(tiny_llava_dir):
    """{'image': raw HWC uint8} runs the checkpoint's HF image processor and
    produces the same generation as pre-computed pixel_values."""
    from transformers import CLIPImageProcessor

    from vllm_neuron_tpu import LLM, SamplingParams

    proc = CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32})
    proc.save_pretrained(tiny_llava_dir)

    rng = np.random.default_rng(4)
    raw = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    pixels = np.asarray(proc(images=raw, return_tensors="np")["pixel_values"])
    assert pixels.shape == (1, 3, 32, 32)

    from transformers import AutoConfig
    cfg = AutoConfig.from_pretrained(tiny_llava_dir)
    prompt = [7] + [cfg.image_token_index] * 16 + [9]
    llm = LLM(model=tiny_llava_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    a = llm.generate({"prompt_token_ids": prompt,
                      "multi_modal_data": {"image": raw}}, sp)[0]
    b = llm.generate({"prompt_token_ids": prompt,
                      "multi_modal_data": {"pixel_values": pixels}}, sp)[0]
    assert list(a.outputs[0].token_ids) == list(b.outputs[0].token_ids)


def test_text_only_llava_serves_as_llama(tiny_llava_dir):
    """A composite checkpoint with no image request runs the plain decoder
    path (prefix auto-detection in the loader)."""
    import torch
    from transformers import LlavaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    prompt = [5, 6, 7, 8]
    hf = LlavaForConditionalGeneration.from_pretrained(
        tiny_llava_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones((1, len(prompt)), dtype=torch.long),
            max_new_tokens=6, do_sample=False, num_beams=1)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tiny_llava_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    got = llm.generate({"prompt_token_ids": prompt},
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))[0].outputs[0].token_ids
    assert list(got) == ref, f"{got} vs {ref}"
