# SPDX-License-Identifier: Apache-2.0
"""Accuracy north-star regression on the committed TRAINED checkpoint.

`ckpt_tinypy/` is a converged byte-level Llama trained on Python sources
(tools/train_tiny.py) — real learned weights, so quantization error is
representative (docs/ACCURACY.md records the full-TPU sweep; the north
star is Δppl ≤ 0.05, BASELINE.md). This test recomputes the BF16 vs
INT8/W8A8 deltas on a smaller token budget and pins greedy decoding
against the transformers oracle on the same weights (reference analogue:
/root/reference/test/e2e/online/online_server_runner.py:95-146).
"""
import os

import numpy as np
import pytest

from tests.conftest import hf_greedy

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ckpt_tinypy")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "model.safetensors")),
    reason="trained tiny checkpoint not present")


def _val_tokens(n: int) -> np.ndarray:
    return np.load(os.path.join(CKPT, "val_tokens.npy"))[:n]


def test_trained_ppl_quant_deltas():
    from vllm_neuron_tpu.tools.eval_ppl import evaluate_ppl
    toks = _val_tokens(4097)
    base = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16")
    # Trained-model sanity: far below the uniform-byte ceiling (ppl 256).
    # (The full 65k-token sweep lands at 5.91, docs/ACCURACY.md; this
    # 4k prefix is easier text, ~1.8.)
    assert 1.1 < base["ppl"] < 12.0
    int8 = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16",
                        quantization="int8")
    assert abs(int8["ppl"] - base["ppl"]) <= 0.05, (base, int8)
    os.environ["VLLM_TPU_W8A8_MIN_ROWS"] = "256"
    try:
        w8a8 = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16",
                            quantization="int8")
    finally:
        del os.environ["VLLM_TPU_W8A8_MIN_ROWS"]
    assert abs(w8a8["ppl"] - base["ppl"]) <= 0.05, (base, w8a8)


def test_trained_fp8_kv_ppl_delta():
    from vllm_neuron_tpu.tools.eval_ppl import evaluate_ppl
    toks = _val_tokens(2049)
    base = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16")
    fp8kv = evaluate_ppl(CKPT, toks, window=512, dtype="bfloat16",
                         kv_cache_dtype="fp8")
    assert abs(fp8kv["ppl"] - base["ppl"]) <= 0.05, (base, fp8kv)


def test_trained_greedy_matches_hf():
    """Greedy continuation on REAL weights matches transformers exactly."""
    from vllm_neuron_tpu.engine.llm import LLM, SamplingParams
    prompt = [int(b) for b in b"def fibonacci(n):\n    "]
    llm = LLM(CKPT, dtype="float32", max_model_len=256, max_num_seqs=2)
    out = llm.generate({"prompt_token_ids": prompt},
                       SamplingParams(max_tokens=24, temperature=0.0))[0]
    ref = hf_greedy(CKPT, prompt, 24)
    assert list(out.outputs[0].token_ids) == ref
