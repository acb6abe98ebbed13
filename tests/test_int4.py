# SPDX-License-Identifier: Apache-2.0
"""Grouped INT4 weight quantization (w4a16) — beyond the reference's
INT8/FP8 surface (model_loader.py:886-898): decode on TPU is
weight-HBM-bound, so int4 halves the per-step traffic floor again.
Covers pack/unpack roundtrip, the XLA fallback, the Pallas kernel in
interpret mode, and full-engine serving."""
import numpy as np
import pytest


def test_int4_pack_roundtrip():
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (quantize_int4_grouped,
                                           unpack_int4)

    rng = np.random.default_rng(0)
    w = rng.normal(size=(512, 96)).astype(np.float32)
    packed, scale = quantize_int4_grouped(w, group_size=128)
    assert packed.shape == (256, 96) and packed.dtype == np.int8
    assert scale.shape == (4, 96)
    q = np.asarray(unpack_int4(jnp.asarray(packed)))
    assert q.min() >= -7 and q.max() <= 7
    deq = q.reshape(4, 128, 96) * scale[:, None, :]
    err = np.abs(deq.reshape(512, 96) - w)
    # Max error is half an int4 step (scale = absmax/7 per group).
    assert np.all(err <= scale.repeat(128, axis=0) * 0.5 + 1e-6)


def test_int4_stacked_layers():
    from vllm_neuron_tpu.ops.quant import quantize_int4_grouped

    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 256, 64)).astype(np.float32)  # [L, K, N]
    packed, scale = quantize_int4_grouped(w, group_size=128)
    assert packed.shape == (3, 128, 64)
    assert scale.shape == (3, 2, 64)
    # Odd group fit: K not a multiple of 2*G falls back to G = K/2.
    packed2, scale2 = quantize_int4_grouped(
        rng.normal(size=(192, 64)).astype(np.float32), group_size=128)
    assert packed2.shape == (96, 64) and scale2.shape == (2, 64)


def test_int4_linear_fallback_exact():
    """dequant_matmul int4 route == manual dequantized matmul."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (dequant_matmul,
                                           quantize_int4_grouped,
                                           unpack_int4)

    rng = np.random.default_rng(2)
    w = rng.normal(size=(256, 128)).astype(np.float32)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    packed, scale = quantize_int4_grouped(w, group_size=64)
    got = dequant_matmul(jnp.asarray(x), jnp.asarray(packed),
                         jnp.asarray(scale))
    q = np.asarray(unpack_int4(jnp.asarray(packed))).astype(np.float32)
    deq = (q.reshape(4, 64, 128) * scale[:, None, :]).reshape(256, 128)
    want = x @ deq
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_int4_pallas_kernel_interpret(variant):
    """Every Mosaic kernel variant (interpret mode) matches the XLA
    fallback — v1 = in-VMEM f32 grouped dequant, v2 = per-group dots with
    post-dot f32 scales (exact reassociation), v3 = bf16 scale-fold (the
    scale rounds to bf16, same order as the int4 quantization error)."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (_dequant_matmul_int4_jnp,
                                           _dequant_matmul_int4_pallas,
                                           quantize_int4_grouped)

    rng = np.random.default_rng(3)
    K, N, M = 512, 256, 16
    w = rng.normal(size=(K, N)).astype(np.float32)
    x = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    packed, scale = quantize_int4_grouped(w, group_size=128)
    xj = jnp.asarray(x, jnp.bfloat16)
    got = _dequant_matmul_int4_pallas(xj, jnp.asarray(packed),
                                      jnp.asarray(scale),
                                      out_dtype=jnp.float32,
                                      interpret=True, variant=variant)
    want = _dequant_matmul_int4_jnp(xj, jnp.asarray(packed),
                                    jnp.asarray(scale), jnp.float32)
    tol = 4e-2 if variant == "v3" else 2e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_int4_engine_generate(tiny_llama_dir):
    from vllm_neuron_tpu import LLM, SamplingParams

    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              quantization="int4")
    import jax.numpy as jnp
    layers = llm.engine.worker.model_runner.executor.params["layers"]
    # Stacked wqkv: [L, K/2, (nH+2nKV)*D] packed int8 + grouped scale.
    assert layers["wqkv"].dtype == jnp.int8
    assert layers["wqkv_scale"].shape[1] >= 1
    out = llm.generate({"prompt_token_ids": [5, 77, 301, 44]},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 8


def test_int4_ppl_delta_tinypy():
    """Perplexity delta vs BF16 on the TRAINED tiny checkpoint
    (ckpt_tinypy). INT4 sits below the reference's bit-width floor so
    the ≤0.05 north star does not bind it; gate at a documented looser
    bound to catch regressions (docs/ACCURACY.md)."""
    import os

    from tests.test_accuracy_tinypy import CKPT, _val_tokens
    if not os.path.exists(os.path.join(CKPT, "model.safetensors")):
        pytest.skip("trained tiny checkpoint not present")
    from vllm_neuron_tpu.tools.eval_ppl import evaluate_ppl

    toks = _val_tokens(4097)
    base = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16")
    int4 = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16",
                        quantization="int4")
    d_ppl = abs(int4["ppl"] - base["ppl"])
    # Measured +0.050 on this window (docs/ACCURACY.md); 0.1 gives 2x
    # headroom for numerics drift while catching any real regression
    # (the old 0.35 bound would have passed a 7x accuracy loss).
    assert d_ppl <= 0.1, (base, int4)


def test_int4_group_size_respected_when_divisible():
    """K % group_size == 0 must keep the configured group size even when
    K % (2*group_size) != 0 (regression: the old condition coarsened
    K=384/G=128 to G=192)."""
    from vllm_neuron_tpu.ops.quant import quantize_int4_grouped

    rng = np.random.default_rng(5)
    w = rng.normal(size=(384, 64)).astype(np.float32)
    packed, scale = quantize_int4_grouped(w, group_size=128)
    assert scale.shape == (3, 64)  # Kg = 384/128, not 384/192


def test_int4_mllama_serves(tiny_mllama_dir=None):
    """quantization='int4' on the Mllama family routes to the grouped
    packer (regression: it used to crash in quantize_per_channel)."""
    import torch
    from transformers import MllamaConfig, MllamaForConditionalGeneration
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)

    from vllm_neuron_tpu import LLM, SamplingParams

    torch.manual_seed(5)
    vision = MllamaVisionConfig(
        hidden_size=32, num_hidden_layers=1, num_global_layers=1,
        num_attention_heads=2, intermediate_size=64, vision_output_dim=64,
        image_size=32, patch_size=8, max_num_tiles=4,
        intermediate_layers_indices=[0])
    text = MllamaTextConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        cross_attention_layers=[1], max_position_embeddings=256,
        rope_scaling={"rope_type": "default"}, pad_token_id=0)
    cfg = MllamaConfig(vision_config=vision.to_dict(),
                       text_config=text.to_dict(), image_token_index=400)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        MllamaForConditionalGeneration(cfg).save_pretrained(
            d, safe_serialization=True)
        llm = LLM(model=d, dtype="float32", max_model_len=64,
                  max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                  quantization="int4")
        out = llm.generate({"prompt_token_ids": [5, 6, 7, 8]},
                           SamplingParams(temperature=0.0, max_tokens=6,
                                          ignore_eos=True))[0]
        assert len(out.outputs[0].token_ids) == 6


def test_expert_skip_list_is_all_or_nothing(tiny_llama_dir):
    """Naming ONE expert stack in modules_to_not_convert keeps the whole
    expert unit dense (regression: partial skip used to serve unscaled
    int8 matmuls or crash with KeyError)."""
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    import jax.numpy as jnp
    from vllm_neuron_tpu import LLM, SamplingParams

    torch.manual_seed(5)
    cfg = Qwen3MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        mlp_only_layers=[], norm_topk_prob=True,
        max_position_embeddings=256, tie_word_embeddings=False)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        Qwen3MoeForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
        llm = LLM(model=d, dtype="float32", max_model_len=128,
                  max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                  quantization="int8",
                  override_tpu_config={
                      "modules_to_not_convert": ["we_up"]})
        layers = llm.engine.worker.model_runner.executor.params["layers"]
        # Whole unit stays dense; attention stacks still quantize.
        assert layers["we_gate"].dtype != jnp.int8
        assert "we_gate_scale" not in layers
        assert layers["wq"].dtype == jnp.int8
        out = llm.generate({"prompt_token_ids": [5, 77, 301, 44]},
                           SamplingParams(temperature=0.0, max_tokens=6,
                                          ignore_eos=True))[0]
        assert len(out.outputs[0].token_ids) == 6


def test_int4_stacked_kernel_interpret():
    """The layer-indexed stacked kernel (copy-free scan path) matches the
    per-layer sliced fallback for every layer index."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (_dequant_matmul_int4_jnp,
                                           _dequant_matmul_int4_stacked_pallas,
                                           quantize_int4_grouped)

    rng = np.random.default_rng(5)
    L, K, N, M = 3, 512, 256, 16
    packed, scales = [], []
    ws = []
    for l in range(L):
        w = rng.normal(size=(K, N)).astype(np.float32)
        pk, sc = quantize_int4_grouped(w, group_size=128)
        ws.append(w)
        packed.append(pk)
        scales.append(sc)
    pk = jnp.asarray(np.stack(packed))
    sc = jnp.asarray(np.stack(scales))
    x = jnp.asarray((rng.normal(size=(M, K)) * 0.1), jnp.bfloat16)
    for l in range(L):
        got = _dequant_matmul_int4_stacked_pallas(
            x, pk, sc, l, out_dtype=jnp.float32, interpret=True)
        want = _dequant_matmul_int4_jnp(x, pk[l], sc[l], jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_int4_ktiled_stacked_kernel_interpret():
    """The K-tiled stacked kernel (contiguous full-N weight chunks, f32
    accumulation over the K grid) matches the per-layer jnp fallback for
    every layer index, including shapes where K/2 spans multiple chunks."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (_dequant_matmul_int4_jnp,
                                           _dequant_matmul_int4_ktiled_stacked,
                                           quantize_int4_grouped)

    rng = np.random.default_rng(7)
    # K=1024 with group 128 -> K/2=512 packed rows = 4 groups per half;
    # the chunk picker lands on a multi-chunk grid at small target sizes.
    L, K, N, M = 3, 1024, 256, 16
    packed, scales = [], []
    for l in range(L):
        w = rng.normal(size=(K, N)).astype(np.float32)
        pk, sc = quantize_int4_grouped(w, group_size=128)
        packed.append(pk)
        scales.append(sc)
    pk = jnp.asarray(np.stack(packed))
    sc = jnp.asarray(np.stack(scales))
    x = jnp.asarray((rng.normal(size=(M, K)) * 0.1), jnp.bfloat16)
    for l in range(L):
        got = _dequant_matmul_int4_ktiled_stacked(
            x, pk, sc, l, out_dtype=jnp.float32, interpret=True)
        want = _dequant_matmul_int4_jnp(x, pk[l], sc[l], jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_int4_w4a8_rq_kernel_interpret(monkeypatch):
    """The requantize-chunk W4A8 variant (8-group chunks on a common int8
    grid, one s8 dot per chunk) stays within combined int4+activation+
    requant tolerance of the w4a16 reference."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops import quant as Q

    monkeypatch.setenv("VLLM_TPU_W4A8_KERNEL", "rq")
    Q._w4a8_kernel_variant.cache_clear()
    Q._dequant_matmul_int4_w4a8_stacked._clear_cache()
    try:
        rng = np.random.default_rng(11)
        L, K, N, M = 2, 2048, 256, 64  # Kg=16 groups -> 2 chunks of 8
        packed, scales = [], []
        for l in range(L):
            w = rng.normal(size=(K, N)).astype(np.float32)
            pk, sc = Q.quantize_int4_grouped(w, group_size=128)
            packed.append(pk)
            scales.append(sc)
        pk = jnp.asarray(np.stack(packed))
        sc = jnp.asarray(np.stack(scales))
        x = jnp.asarray((rng.normal(size=(M, K)) * 0.1), jnp.float32)
        for l in range(L):
            got = Q._dequant_matmul_int4_w4a8_stacked(
                x, pk, sc, l, out_dtype=jnp.float32, interpret=True)
            want = Q._dequant_matmul_int4_jnp(x, pk[l], sc[l], jnp.float32)
            rel = float(jnp.max(jnp.abs(got - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            assert rel < 0.06, rel
    finally:
        Q._w4a8_kernel_variant.cache_clear()
        Q._dequant_matmul_int4_w4a8_stacked._clear_cache()


def test_int4_w4a8_stacked_kernel_interpret():
    """W4A8 stacked kernel (prefill path): int8 activations x unpacked
    int4 weights with post-dot (row x group) scales matches the w4a16
    reference within activation-quant tolerance."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (_dequant_matmul_int4_jnp,
                                           _dequant_matmul_int4_w4a8_stacked,
                                           quantize_int4_grouped)

    rng = np.random.default_rng(9)
    L, K, N, M = 2, 512, 256, 32
    packed, scales = [], []
    for l in range(L):
        w = rng.normal(size=(K, N)).astype(np.float32)
        pk, sc = quantize_int4_grouped(w, group_size=128)
        packed.append(pk)
        scales.append(sc)
    pk = jnp.asarray(np.stack(packed))
    sc = jnp.asarray(np.stack(scales))
    x = jnp.asarray((rng.normal(size=(M, K)) * 0.1), jnp.float32)
    from vllm_neuron_tpu.ops.quant import unpack_int4
    for l in range(L):
        got = _dequant_matmul_int4_w4a8_stacked(
            x, pk, sc, l, out_dtype=jnp.float32, interpret=True)
        # Exact emulation of the kernel's arithmetic: per-row int8
        # activation quant, int32 dots per group, post-dot scales.
        xf = np.asarray(x, np.float32)
        xs = np.maximum(np.abs(xf).max(-1, keepdims=True) / 127.0, 1e-12)
        xi = np.clip(np.round(xf / xs), -127, 127).astype(np.int32)
        q = np.asarray(unpack_int4(pk[l]), np.int32)  # [K, N]
        Kg = sc.shape[-2]
        gs = K // Kg
        acc = np.zeros((M, N), np.float32)
        for g in range(Kg):
            part = xi[:, g * gs:(g + 1) * gs] @ q[g * gs:(g + 1) * gs, :]
            acc += part.astype(np.float32) * np.asarray(sc[l])[g][None, :]
        want = acc * xs
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)
        # ... and within activation-quant noise of the w4a16 reference.
        ref16 = np.asarray(_dequant_matmul_int4_jnp(x, pk[l], sc[l],
                                                    jnp.float32))
        assert np.abs(np.asarray(got) - ref16).max() < 0.15
