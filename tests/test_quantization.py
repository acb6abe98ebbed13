# SPDX-License-Identifier: Apache-2.0
"""Quantization: INT8/FP8 weights, FP8 KV cache, numerics deltas.

BASELINE.md target: quantized-vs-BF16 perplexity delta <= 0.05 at matched bit
widths; here the tiny-model analogue pins the NLL delta on fixed token
streams (reference quant surface: model_loader.py:886-898, platform.py:30)."""
import numpy as np
import pytest

from vllm_neuron_tpu import LLM, SamplingParams


def _avg_nll(llm, token_stream: list[int]) -> float:
    """Average NLL of token_stream[1:] given the prefix, through the
    engine's prefill logits path (teacher forcing via logprobs)."""
    sp = SamplingParams(temperature=0.0, max_tokens=1, logprobs=0,
                        ignore_eos=True)
    import jax.numpy as jnp

    runner = llm.engine.worker.model_runner
    model = runner.model
    executor = runner.executor
    from vllm_neuron_tpu.ops.ragged_attention import RaggedMeta

    T = len(token_stream)
    spec = executor.kv_spec
    bs = spec.block_size
    n_pages = (T + bs - 1) // bs
    slots = jnp.asarray([(1 + t // bs) * bs + t % bs for t in range(T)],
                        jnp.int32)
    pi = jnp.zeros((1, spec.max_blocks_per_seq), jnp.int32)
    pi = pi.at[0, :n_pages].set(jnp.arange(1, n_pages + 1))
    meta = RaggedMeta(slot_mapping=slots,
                      kv_lens=jnp.asarray([T], jnp.int32),
                      page_indices=pi,
                      cu_q_lens=jnp.asarray([0, T], jnp.int32),
                      num_seqs=jnp.asarray([1], jnp.int32))
    kv = spec.allocate()  # FP8 specs get the scaled container
    ids = jnp.asarray(token_stream, jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    hidden, _ = model.forward(executor.params, ids, pos, kv, meta,
                              kind="prefill")
    logits = model.compute_logits(executor.params, hidden)  # [T, V]
    logprobs = logits - jnp.log(jnp.sum(jnp.exp(logits), axis=-1,
                                        keepdims=True))
    nll = -logprobs[jnp.arange(T - 1), jnp.asarray(token_stream[1:])]
    return float(jnp.mean(nll))


STREAM = [5, 77, 301, 44, 12, 99, 8, 250, 251, 252, 100, 101, 30, 31, 32,
          33, 90, 91, 92, 7, 8, 9, 10, 401, 3, 3, 17]


@pytest.fixture(scope="module")
def nll_f32(tiny_llama_dir):
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True)
    return _avg_nll(llm, STREAM)


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_quantized_nll_delta(tiny_llama_dir, nll_f32, quant):
    llm_q = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                quantization=quant)
    delta = abs(_avg_nll(llm_q, STREAM) - nll_f32)
    assert delta <= 0.06, f"{quant} NLL delta {delta:.4f} too large"


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_quantized_generate(tiny_llama_dir, quant):
    llm_q = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                quantization=quant)
    out = llm_q.generate({"prompt_token_ids": [5, 77, 301, 44]},
                         SamplingParams(temperature=0.0, max_tokens=8,
                                        ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 8


def test_fp8_kv_cache(tiny_llama_dir, nll_f32):
    """FP8 KV with per-slot/per-head scales (ops/ragged_attention.
    FP8KVCache): the delta bound is TIGHTER than the old scale-less cast's
    0.08 because the scales recover the per-head magnitude spread."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              kv_cache_dtype="fp8")
    from vllm_neuron_tpu.ops.ragged_attention import FP8KVCache
    assert isinstance(llm.engine.worker.model_runner.executor.kv_pages,
                      FP8KVCache)
    delta = abs(_avg_nll(llm, STREAM) - nll_f32)
    assert delta <= 0.03, f"fp8 KV NLL delta {delta:.4f} too large"
    out = llm.generate({"prompt_token_ids": [5, 77, 301, 44]},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 8


def test_fp8_kv_scales_roundtrip():
    """write_kv_pages + gather on the scaled FP8 cache reconstructs K/V to
    e4m3 relative precision. Scales are PER-SLOT (one scalar per written
    token, lane-replicated — the per-head layout's minor-16 scatter cost
    4.6 ms/layer on v5e, perf/fp8_scatter_ab.py): e4m3 is floating point,
    so a single per-token scale keeps relative precision across head
    magnitude spreads up to ~2^14 (normal range below the absmax pin);
    100x spreads — far beyond real K/V head spreads — reconstruct fine,
    where a scale-less raw cast loses the token-to-token spread."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.ragged_attention import (FP8KVCache,
                                                      SCALE_LANES,
                                                      write_kv_pages)

    rng = np.random.default_rng(0)
    Hkv, D, ps = 2, 128, 8
    kv = FP8KVCache(jnp.zeros((4, ps, 2 * Hkv, D), jnp.float8_e4m3fn),
                    jnp.zeros((4, ps, SCALE_LANES), jnp.bfloat16))
    # Head 0 small, head 1 large (100x), and token magnitudes varying 1e4
    # across the batch (raw e4m3 would saturate or flush those).
    tok_mag = 10.0 ** rng.uniform(-2, 2, size=(6, 1))
    k = np.stack([rng.normal(size=(6, D)) * 1e-1 * tok_mag,
                  rng.normal(size=(6, D)) * 1e1 * tok_mag], axis=1)
    v = np.stack([rng.normal(size=(6, D)) * 1e1 * tok_mag,
                  rng.normal(size=(6, D)) * 1e-1 * tok_mag], axis=1)
    slots = jnp.asarray([8, 9, 10, 11, 12, 13], jnp.int32)  # page 1
    out = write_kv_pages(kv, jnp.asarray(k, jnp.float32),
                         jnp.asarray(v, jnp.float32), slots)
    flat_p = np.asarray(out.pages.reshape(4 * ps, 2 * Hkv, D),
                        np.float32)
    flat_s = np.asarray(out.scales.reshape(4 * ps, SCALE_LANES),
                        np.float32)
    # Lane-replicated: every lane holds the same per-slot scale.
    assert (flat_s[8:14] == flat_s[8:14, :1]).all()
    got_k = flat_p[8:14, 0::2] * flat_s[8:14, :1, None]
    got_v = flat_p[8:14, 1::2] * flat_s[8:14, :1, None]
    # Error bound: e4m3 mantissa relative error (~2^-3), OR the subnormal
    # quantum scale*2^-9 for elements near zero.
    s_tok = flat_s[8:14, 0][:, None, None]
    for got, ref in ((got_k, k), (got_v, v)):
        tol = np.maximum(np.abs(ref) * 0.12, s_tok * 2.0**-8)
        bad = np.abs(got - ref) > tol
        assert not bad.any(), (np.abs(got - ref)[bad], ref[bad])


def test_dequant_matmul_numerics():
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import dequant_matmul, quantize_per_channel

    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    for quant, tol in (("int8", 2e-2), ("fp8", 8e-2)):
        wq, scale = quantize_per_channel(w, quant)
        got = np.asarray(dequant_matmul(jnp.asarray(x), jnp.asarray(wq),
                                        jnp.asarray(scale)))
        ref = x @ w
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < tol, f"{quant}: relative error {err}"


def test_quantized_weights_dtype(tiny_llama_dir):
    import jax.numpy as jnp
    llm_q = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                quantization="int8")
    layers = llm_q.engine.worker.model_runner.executor.params["layers"]
    assert layers["wqkv"].dtype == jnp.int8
    assert layers["wqkv_scale"].dtype == jnp.float32
    assert layers["attn_norm"].dtype != jnp.int8  # norms untouched


def test_w8a8_matmul_numerics():
    """Dynamic per-token activation quant + s8xs8 dot stays close to the
    f32 reference (dequantized-weight matmul)."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.quant import (_w8a8_matmul,
                                           quantize_per_channel)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((512, 256)).astype(np.float32)
    w = (rng.standard_normal((256, 128)) * 0.1).astype(np.float32)
    wq, scale = quantize_per_channel(w, "int8")
    ref = x @ (wq.astype(np.float32) * scale)
    got = np.asarray(_w8a8_matmul(jnp.asarray(x), jnp.asarray(wq),
                                  jnp.asarray(scale)))
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.01, rel.mean()
    assert rel.max() < 0.12, rel.max()


def test_w8a8_threshold_gating(monkeypatch):
    """The W8A8 path engages only at/above the static row threshold."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops import quant

    monkeypatch.setenv("VLLM_TPU_W8A8_MIN_ROWS", "256")
    quant._w8a8_min_rows.cache_clear()
    try:
        rng = np.random.default_rng(0)
        w = (rng.standard_normal((64, 32)) * 0.1).astype(np.float32)
        wq, scale = quant.quantize_per_channel(w, "int8")
        x_small = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        x_big = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
        ref_small = np.asarray(x_small) @ (wq.astype(np.float32) * scale)
        # Below threshold: exact dequant path (f32 exact for f32 x).
        np.testing.assert_allclose(
            np.asarray(quant.dequant_matmul(x_small, jnp.asarray(wq),
                                            jnp.asarray(scale))),
            ref_small, rtol=1e-5, atol=1e-5)
        # At threshold: quantized activations — close but not exact.
        ref_big = np.asarray(x_big) @ (wq.astype(np.float32) * scale)
        got_big = np.asarray(quant.dequant_matmul(x_big, jnp.asarray(wq),
                                                  jnp.asarray(scale)))
        assert not np.allclose(got_big, ref_big, rtol=1e-6, atol=1e-6)
        rel = np.abs(got_big - ref_big) / (np.abs(ref_big).mean() + 1e-6)
        assert rel.mean() < 0.02
    finally:
        quant._w8a8_min_rows.cache_clear()


def test_quantized_lm_head(tiny_llama_dir):
    """Opt-in int8 head (override_tpu_config quantize_lm_head): params
    carry the int8 head + scale, generation runs, and tp2 equals tp1."""
    import jax.numpy as jnp

    def run(**kw):
        llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                  quantization="int8",
                  override_tpu_config={"quantize_lm_head": True}, **kw)
        out = llm.generate({"prompt_token_ids": [5, 77, 301, 44]},
                           SamplingParams(temperature=0.0, max_tokens=8,
                                          ignore_eos=True))[0]
        return llm, list(out.outputs[0].token_ids)

    llm, toks = run()
    params = llm.engine.worker.model_runner.executor.params
    assert params["lm_head"].dtype == jnp.int8
    assert params["lm_head_scale"].shape[0] == 1
    assert len(toks) == 8
    _, toks_tp = run(tensor_parallel_size=2)
    assert toks_tp == toks


def test_quantized_lm_head_nll_delta(tiny_llama_dir, nll_f32):
    llm_q = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                quantization="int8",
                override_tpu_config={"quantize_lm_head": True})
    delta = abs(_avg_nll(llm_q, STREAM) - nll_f32)
    assert delta <= 0.06, f"int8 lm_head NLL delta {delta:.4f} too large"
