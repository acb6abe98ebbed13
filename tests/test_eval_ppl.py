# SPDX-License-Identifier: Apache-2.0
"""Perplexity harness (BASELINE metric: quantized-vs-BF16 ppl delta)."""
import numpy as np

from vllm_neuron_tpu.tools.eval_ppl import evaluate_ppl


def test_ppl_quant_delta(tiny_llama_dir):
    rng = np.random.default_rng(0)
    toks = rng.integers(1, 512, size=200)
    base = evaluate_ppl(tiny_llama_dir, toks, window=64, dtype="float32")
    assert base["tokens"] == 199
    assert np.isfinite(base["ppl"]) and base["ppl"] > 1
    q = evaluate_ppl(tiny_llama_dir, toks, window=64, dtype="float32",
                     quantization="int8")
    # Tiny random model: NLL delta small at matched precision elsewhere.
    assert abs(q["avg_nll"] - base["avg_nll"]) < 0.06
