# SPDX-License-Identifier: Apache-2.0
"""Compiled-artifact cache reload idempotence (reference:
/root/reference/test/e2e/offline/test_offline_e2e.py:204-281 — a second
engine built on the same config must reload compiled artifacts and generate
identical outputs).

Here the artifact store is the ONE shared content-addressed JAX persistent
compilation cache — keyed internally by HLO hash, deliberately NOT by a
per-config namespace (worker/executor.py _setup_compilation_cache; the
analogue of the reference's md5-keyed neuron-compiled-artifacts dir,
model_loader.py:180-212, minus its per-config recompile trap)."""
import os

import jax
import numpy as np
import pytest

from vllm_neuron_tpu import LLM, SamplingParams


def _cache_files(d):
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_second_engine_reuses_compiled_artifacts(tiny_llama_dir, tmp_path):
    cache_dir = str(tmp_path / "artifacts")
    os.environ["TPU_COMPILED_ARTIFACTS"] = cache_dir
    try:
        rng = np.random.default_rng(0)
        prompts = [rng.integers(1, 512, size=n).tolist() for n in (9, 40)]
        sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

        def build_and_run():
            # JAX binds the persistent-cache handle to the first dir used
            # in the process; drop it so this engine's cache dir takes
            # effect even when earlier tests compiled things.
            from jax._src import compilation_cache as cc
            cc.reset_cache()
            llm = LLM(model=tiny_llama_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=4, block_size=16,
                      skip_tokenizer_init=True)
            # CPU compiles are sub-second; drop the persistence threshold
            # so they land in the cache like the (slow) TPU ones do.
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                                [sp] * len(prompts))
            cfg_hash = llm.config.config_hash()
            return [o.outputs[0].token_ids for o in outs], cfg_hash

        first, hash1 = build_and_run()
        files_after_first = _cache_files(cache_dir)
        assert files_after_first, \
            "first build persisted no compiled artifacts"

        second, hash2 = build_and_run()
        files_after_second = _cache_files(cache_dir)

        # Same config -> same cache key -> the second build compiled
        # NOTHING new (every executable loaded from the artifact store).
        assert hash1 == hash2
        assert files_after_second == files_after_first, (
            f"second build added artifacts: "
            f"{set(files_after_second) - set(files_after_first)}")
        # ... and generations are identical (reference idempotence check).
        assert second == first
    finally:
        os.environ.pop("TPU_COMPILED_ARTIFACTS", None)


def test_config_hash_separates_configs(tiny_llama_dir):
    """Different engine configs must not share an artifact namespace."""
    from vllm_neuron_tpu.engine.llm import build_engine_config
    a = build_engine_config(tiny_llama_dir, dtype="float32",
                            max_model_len=128, max_num_seqs=4, block_size=16)
    b = build_engine_config(tiny_llama_dir, dtype="float32",
                            max_model_len=128, max_num_seqs=8, block_size=16)
    assert a.config_hash() != b.config_hash()
