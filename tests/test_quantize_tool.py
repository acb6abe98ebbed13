# SPDX-License-Identifier: Apache-2.0
"""Quantize-and-save tool round trip (reference analogue:
save_quantized_state_dict + reload, model_loader.py:238-240)."""
import numpy as np

from vllm_neuron_tpu import LLM, SamplingParams


def test_quantize_save_load_roundtrip(tiny_llama_dir, tmp_path):
    from vllm_neuron_tpu.tools.quantize import quantize_and_save

    out_dir = str(tmp_path / "int8_ckpt")
    quantize_and_save(tiny_llama_dir, out_dir, "int8", dtype="float32")

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = {"prompt_token_ids": [5, 77, 301, 44, 12]}

    llm_live = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                   max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                   quantization="int8")
    live = llm_live.generate(prompt, sp)[0].outputs[0].token_ids

    llm_pre = LLM(model=out_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                  quantization="int8")
    pre = llm_pre.generate(prompt, sp)[0].outputs[0].token_ids
    assert pre == live, f"prequantized {pre} vs live-quantized {live}"

    import jax.numpy as jnp
    layers = llm_pre.engine.worker.model_runner.executor.params["layers"]
    assert layers["wqkv"].dtype == jnp.int8


def test_quantize_save_load_roundtrip_int4(tiny_llama_dir, tmp_path):
    """INT4 grouped checkpoints round-trip: packed nibbles + grouped
    scales survive the save/load path and reproduce the live output."""
    from vllm_neuron_tpu.tools.quantize import quantize_and_save

    out_dir = str(tmp_path / "int4_ckpt")
    quantize_and_save(tiny_llama_dir, out_dir, "int4", dtype="float32")

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = {"prompt_token_ids": [5, 77, 301, 44, 12]}

    llm_live = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                   max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                   quantization="int4")
    live = llm_live.generate(prompt, sp)[0].outputs[0].token_ids

    llm_pre = LLM(model=out_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                  quantization="int4")
    pre = llm_pre.generate(prompt, sp)[0].outputs[0].token_ids
    assert pre == live, f"prequantized {pre} vs live-quantized {live}"

    import jax.numpy as jnp
    layers = llm_pre.engine.worker.model_runner.executor.params["layers"]
    # Packed: K/2 rows vs the dense stack's K.
    assert layers["wqkv"].dtype == jnp.int8
    assert layers["wqkv_scale"].shape[1] >= 1
