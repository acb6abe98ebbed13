# SPDX-License-Identifier: Apache-2.0
"""Mllama (Llama 3.2 Vision) vs HF transformers (CPU oracle).

Reference capability: Mllama family support
(vllm_neuron/worker/constants.py:4-7,
neuronx_distributed_model_loader.py:399-556). Covers the two-stage vision
tower, the gated cross-attention text decoder, and text-only serving
through the engine (cross layers skipped, paged KV compacted to self
layers).
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mllama_dir(tmp_path_factory):
    import torch
    from transformers import MllamaConfig, MllamaForConditionalGeneration
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)

    torch.manual_seed(5)
    vision = MllamaVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_global_layers=1,
        num_attention_heads=2, intermediate_size=64, vision_output_dim=64,
        image_size=32, patch_size=8, max_num_tiles=4,
        intermediate_layers_indices=[1])
    text = MllamaTextConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        cross_attention_layers=[1], max_position_embeddings=256,
        rope_scaling={"rope_type": "default"}, pad_token_id=0)
    cfg = MllamaConfig(vision_config=vision.to_dict(),
                       text_config=text.to_dict(), image_token_index=400)
    model = MllamaForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_mllama")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def _image_inputs():
    rng = np.random.default_rng(2)
    px = rng.normal(size=(1, 1, 4, 3, 32, 32)).astype(np.float32)
    ar_ids = np.array([[6]], np.int32)  # aspect ratio [2,2]: all 4 tiles
    ar_mask = np.ones((1, 1, 4), np.int32)
    return px, ar_ids, ar_mask


def test_vision_tower_matches_hf(tiny_mllama_dir):
    import torch
    from transformers import AutoConfig, MllamaForConditionalGeneration

    hf = MllamaForConditionalGeneration.from_pretrained(
        tiny_mllama_dir, torch_dtype=torch.float32)
    hf.eval()
    px, ar_ids, ar_mask = _image_inputs()
    with torch.no_grad():
        vo = hf.model.vision_model(
            pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids, dtype=torch.long),
            aspect_ratio_mask=torch.tensor(ar_mask, dtype=torch.long))
        cs = vo.last_hidden_state  # [B, M, T, patches, vision_output_dim]
        ref = hf.model.multi_modal_projector(cs).reshape(
            1, -1, hf.config.text_config.hidden_size).numpy()

    import jax.numpy as jnp

    from vllm_neuron_tpu.models.mllama import MllamaVisionEncoder

    cfg = AutoConfig.from_pretrained(tiny_mllama_dir)
    enc = MllamaVisionEncoder(cfg, jnp.float32)
    params = enc.load_params(tiny_mllama_dir)
    got = np.asarray(enc.forward(params, jnp.asarray(px),
                                 jnp.asarray(ar_ids), jnp.asarray(ar_mask)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


def test_cross_attention_decoder_matches_hf(tiny_mllama_dir):
    """Full image-conditioned forward: my vision encoder feeding my gated
    cross-attention decoder reproduces the HF composite model's logits."""
    import torch
    from transformers import AutoConfig, MllamaForConditionalGeneration

    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.engine.llm import build_engine_config
    from vllm_neuron_tpu.models.mllama import (MllamaForCausalLM,
                                               MllamaVisionEncoder)
    from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                      padded_head_dim)

    px, ar_ids, ar_mask = _image_inputs()
    cfg = AutoConfig.from_pretrained(tiny_mllama_dir)
    prompt = [cfg.image_token_index, 7, 8, 9, 10, 11, 12]
    S = len(prompt)

    hf = MllamaForConditionalGeneration.from_pretrained(
        tiny_mllama_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([prompt]),
                 pixel_values=torch.tensor(px),
                 aspect_ratio_ids=torch.tensor(ar_ids, dtype=torch.long),
                 aspect_ratio_mask=torch.tensor(ar_mask, dtype=torch.long),
                 cross_attention_mask=torch.ones((1, S, 1, 4),
                                                 dtype=torch.long))
        ref = out.logits[0].float().numpy()  # [S, V]

    config = build_engine_config(tiny_mllama_dir, dtype="float32",
                                 max_model_len=64, max_num_seqs=1,
                                 block_size=16)
    enc = MllamaVisionEncoder(cfg, jnp.float32)
    eparams = enc.load_params(tiny_mllama_dir)
    cross_states = enc.forward(jax.tree.map(jnp.asarray, eparams),
                               jnp.asarray(px), jnp.asarray(ar_ids),
                               jnp.asarray(ar_mask))  # [1, 68, H]
    model = MllamaForCausalLM(config.model)
    params = model.load_params(tiny_mllama_dir)

    kv = jnp.zeros((model.num_kv_layers, 8, 16, 2 * model.num_kv_heads,
                    padded_head_dim(model.head_dim)), jnp.float32)
    pos = jnp.arange(S, dtype=jnp.int32)
    meta = RaggedMeta(
        slot_mapping=(16 + pos).astype(jnp.int32),
        kv_lens=jnp.asarray([S], jnp.int32),
        page_indices=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        cu_q_lens=jnp.asarray([0, S], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32))
    cross_valid = jnp.ones((1, cross_states.shape[1]), bool)
    hidden, _ = model.forward(params, jnp.asarray(prompt), pos, kv, meta,
                              kind="prefill", cross_states=cross_states,
                              cross_valid=cross_valid)
    got = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


def test_text_only_greedy_matches_hf(tiny_mllama_dir):
    """Text-only Mllama through the full engine: cross layers skipped,
    paged KV compacted to self layers, greedy matches HF."""
    import torch
    from transformers import MllamaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    prompt = [5, 6, 7, 8, 9]
    hf = MllamaForConditionalGeneration.from_pretrained(
        tiny_mllama_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            attention_mask=torch.ones((1, len(prompt)), dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1)
    ref = out[0, len(prompt):].tolist()

    llm = LLM(model=tiny_mllama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    got = llm.generate({"prompt_token_ids": prompt},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0].outputs[0].token_ids
    assert list(got) == ref, f"{got} vs {ref}"


def test_image_serving_greedy_matches_hf(tiny_mllama_dir):
    """Image-conditioned Mllama through the FULL engine: vision tower at
    prefill, per-row cross-KV cache, cross-attention in every decode step.
    Mixed with a concurrent text-only request (row masking must hand text
    rows the exact skip-layers result)."""
    import torch
    from transformers import AutoConfig, MllamaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_mllama_dir)
    px, ar_ids, ar_mask = _image_inputs()
    img_prompt = [cfg.image_token_index, 7, 8, 9, 10, 11, 12]
    txt_prompt = [5, 6, 7, 8, 9]
    S = len(img_prompt)

    hf = MllamaForConditionalGeneration.from_pretrained(
        tiny_mllama_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        img_ref = hf.generate(
            input_ids=torch.tensor([img_prompt]),
            attention_mask=torch.ones((1, S), dtype=torch.long),
            pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids, dtype=torch.long),
            aspect_ratio_mask=torch.tensor(ar_mask, dtype=torch.long),
            cross_attention_mask=torch.ones((1, S, 1, 4), dtype=torch.long),
            max_new_tokens=8, do_sample=False,
            num_beams=1)[0, S:].tolist()
        txt_ref = hf.generate(
            input_ids=torch.tensor([txt_prompt]),
            attention_mask=torch.ones((1, len(txt_prompt)),
                                      dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1
        )[0, len(txt_prompt):].tolist()

    llm = LLM(model=tiny_mllama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(
        [{"prompt_token_ids": img_prompt,
          "multi_modal_data": {"pixel_values": px,
                               "aspect_ratio_ids": ar_ids,
                               "aspect_ratio_mask": ar_mask}},
         {"prompt_token_ids": txt_prompt}],
        [sp, sp])
    assert list(outs[0].outputs[0].token_ids) == img_ref, \
        f"{outs[0].outputs[0].token_ids} vs {img_ref}"
    assert list(outs[1].outputs[0].token_ids) == txt_ref, \
        f"{outs[1].outputs[0].token_ids} vs {txt_ref}"


def test_prefix_cache_isolated_by_image(tiny_mllama_dir):
    """Identical token ids with DIFFERENT images must not share cached
    blocks: the mm digest seeds the hash chain."""
    import torch
    from transformers import AutoConfig, MllamaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_mllama_dir)
    px, ar_ids, ar_mask = _image_inputs()
    rng = np.random.default_rng(9)
    px2 = rng.normal(size=px.shape).astype(np.float32) * 2.0
    prompt = [cfg.image_token_index] + list(range(7, 7 + 18))
    S = len(prompt)

    hf = MllamaForConditionalGeneration.from_pretrained(
        tiny_mllama_dir, torch_dtype=torch.float32)
    hf.eval()
    refs = []
    for p in (px, px2):
        with torch.no_grad():
            refs.append(hf.generate(
                input_ids=torch.tensor([prompt]),
                attention_mask=torch.ones((1, S), dtype=torch.long),
                pixel_values=torch.tensor(p),
                aspect_ratio_ids=torch.tensor(ar_ids, dtype=torch.long),
                aspect_ratio_mask=torch.tensor(ar_mask, dtype=torch.long),
                cross_attention_mask=torch.ones((1, S, 1, 4),
                                                dtype=torch.long),
                max_new_tokens=6, do_sample=False,
                num_beams=1)[0, S:].tolist())

    llm = LLM(model=tiny_mllama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=4, enable_prefix_caching=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    for p, ref in zip((px, px2), refs):
        out = llm.generate(
            {"prompt_token_ids": prompt,
             "multi_modal_data": {"pixel_values": p,
                                  "aspect_ratio_ids": ar_ids,
                                  "aspect_ratio_mask": ar_mask}}, sp)[0]
        assert list(out.outputs[0].token_ids) == ref, \
            f"{out.outputs[0].token_ids} vs {ref}"


def test_quantized_image_serving(tiny_mllama_dir):
    """INT8 weight quantization over the Mllama decoder (self AND cross
    layers): params actually carry int8 stacks + scales, and image +
    text-only serving still produces full generations (reference quant
    surface: model_loader.py:886-898)."""
    import jax.numpy as jnp
    from transformers import AutoConfig

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_mllama_dir)
    px, ar_ids, ar_mask = _image_inputs()
    llm = LLM(model=tiny_mllama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              quantization="int8")
    layers = llm.engine.worker.model_runner.executor.params["layers"]
    model = llm.engine.worker.model_runner.model
    self_lp = layers[model.self_layers[0]]
    cross_lp = layers[model.cross_layers[0]]
    for lp in (self_lp, cross_lp):
        assert lp["wq"].dtype == jnp.int8 and "wq_scale" in lp
        assert lp["wd"].dtype == jnp.int8 and "wd_scale" in lp
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(
        [{"prompt_token_ids": [cfg.image_token_index, 7, 8, 9],
          "multi_modal_data": {"pixel_values": px,
                               "aspect_ratio_ids": ar_ids,
                               "aspect_ratio_mask": ar_mask}},
         {"prompt_token_ids": [5, 6, 7, 8]}],
        [sp, sp])
    assert all(len(o.outputs[0].token_ids) == 6 for o in outs)


def test_mllama_tp2_image_serving(tiny_mllama_dir):
    """Mllama (list-of-dict layers, cross-KV cache) under a tp2 mesh:
    image + text greedy == HF (same regression class as
    test_llama4_tp2_exact)."""
    import torch
    from transformers import AutoConfig, MllamaForConditionalGeneration

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(tiny_mllama_dir)
    px, ar_ids, ar_mask = _image_inputs()
    img_prompt = [cfg.image_token_index, 7, 8, 9, 10, 11, 12]
    S = len(img_prompt)
    hf = MllamaForConditionalGeneration.from_pretrained(
        tiny_mllama_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([img_prompt]),
            attention_mask=torch.ones((1, S), dtype=torch.long),
            pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids, dtype=torch.long),
            aspect_ratio_mask=torch.tensor(ar_mask, dtype=torch.long),
            cross_attention_mask=torch.ones((1, S, 1, 4), dtype=torch.long),
            max_new_tokens=8, do_sample=False, num_beams=1)[0, S:].tolist()

    llm = LLM(model=tiny_mllama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              tensor_parallel_size=2)
    got = llm.generate(
        {"prompt_token_ids": img_prompt,
         "multi_modal_data": {"pixel_values": px,
                              "aspect_ratio_ids": ar_ids,
                              "aspect_ratio_mask": ar_mask}},
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0].token_ids
    assert list(got) == ref, f"{got} vs {ref}"
