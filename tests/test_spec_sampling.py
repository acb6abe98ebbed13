# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding WITH sampling (rejection acceptance).

Reference parity target: fused Eagle speculation and dynamic on-device
sampling enabled simultaneously (vllm-neuron README.md:93). The core
property under test: rejection acceptance preserves the target
distribution exactly, and greedy rows degenerate to exact prefix-match.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _probs(logits, temp=None, tk=None, tp=None):
    from vllm_neuron_tpu.sampling.spec import filtered_probs
    S = logits.shape[0]
    temp = jnp.ones(S) if temp is None else jnp.asarray(temp, jnp.float32)
    tk = jnp.full(S, -1, jnp.int32) if tk is None else jnp.asarray(tk)
    tp = jnp.ones(S) if tp is None else jnp.asarray(tp, jnp.float32)
    return filtered_probs(jnp.asarray(logits, jnp.float32), temp, tk, tp)


def test_filtered_probs_greedy_is_exact_onehot():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 50)).astype(np.float32)
    p = np.asarray(_probs(logits, temp=np.zeros(4)))
    am = logits.argmax(-1)
    expected = np.zeros_like(p)
    expected[np.arange(4), am] = 1.0
    np.testing.assert_array_equal(p, expected)


def test_filtered_probs_matches_softmax_and_filters():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 40)).astype(np.float32)
    # Unfiltered: plain softmax.
    p = np.asarray(_probs(logits))
    ref = np.exp(logits - logits.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(p, ref, atol=1e-6)
    # top-k=5: only the 5 largest survive, renormalized.
    p5 = np.asarray(_probs(logits, tk=np.full(3, 5)))
    assert ((p5 > 0).sum(-1) == 5).all()
    np.testing.assert_allclose(p5.sum(-1), 1.0, atol=1e-6)
    top5 = np.argsort(-logits, -1)[:, :5]
    for r in range(3):
        assert set(np.nonzero(p5[r])[0]) == set(top5[r])


def test_spec_acceptance_greedy_equals_prefix_match():
    """With greedy (one-hot) p and arbitrary q, the accepted sequence is
    the longest drafted prefix matching argmax(p), then the correction."""
    from vllm_neuron_tpu.sampling.spec import spec_acceptance
    rng = np.random.default_rng(2)
    N, K, V = 5, 4, 30
    plog = rng.normal(size=(N, K + 1, V)).astype(np.float32)
    p = np.asarray(_probs(plog.reshape(-1, V),
                          temp=np.zeros(N * (K + 1)))).reshape(N, K + 1, V)
    greedy = plog.argmax(-1)  # [N, K+1]
    drafted = greedy[:, :K].copy()
    # Break the chain at a chosen j per row.
    breaks = [0, 2, 4, 1, 3]
    for i, b in enumerate(breaks):
        if b < K:
            drafted[i, b] = (drafted[i, b] + 1) % V
    q = np.full((N, K, V), 1.0 / V, np.float32)
    out = np.asarray(spec_acceptance(
        jnp.asarray(drafted, jnp.int32), jnp.asarray(q), jnp.asarray(p),
        jax.random.PRNGKey(0)))
    for i, b in enumerate(breaks):
        m = min(b, K) + 1
        assert (out[i, :m] == greedy[i, :m]).all(), (i, out[i], greedy[i])
        assert (out[i, m:] == -1).all()


def test_spec_acceptance_identical_dists_accept_all():
    """p == q => every draft accepted, bonus sampled from p_K."""
    from vllm_neuron_tpu.sampling.spec import spec_acceptance
    rng = np.random.default_rng(3)
    N, K, V = 4, 3, 20
    logits = rng.normal(size=(N, K + 1, V)).astype(np.float32)
    p = np.asarray(_probs(logits.reshape(-1, V))).reshape(N, K + 1, V)
    q = p[:, :K]
    # Draft tokens drawn from q (any support point works).
    drafted = logits[:, :K].argmax(-1).astype(np.int32)
    out = np.asarray(spec_acceptance(
        jnp.asarray(drafted), jnp.asarray(q), jnp.asarray(p),
        jax.random.PRNGKey(1)))
    assert (out[:, :K] == drafted).all()
    assert (out[:, K] >= 0).all()


def test_spec_acceptance_preserves_target_distribution():
    """K=1 rejection sampling: the marginal of the emitted first token must
    equal the TARGET distribution p_0, whatever the draft q proposes."""
    from vllm_neuron_tpu.sampling.spec import (sample_from_probs,
                                               spec_acceptance)
    V = 8
    rng = np.random.default_rng(4)
    p0 = rng.dirichlet(np.ones(V)).astype(np.float32)
    q0 = rng.dirichlet(np.ones(V)).astype(np.float32)
    TRIALS = 4000
    p = jnp.asarray(np.tile(p0, (TRIALS, 2, 1)))  # p_1 irrelevant
    q = jnp.asarray(np.tile(q0, (TRIALS, 1, 1)))
    key = jax.random.PRNGKey(7)
    drafted = sample_from_probs(q, jax.random.fold_in(key, 0))  # [TRIALS,1]
    out = np.asarray(spec_acceptance(drafted, q, p,
                                     jax.random.fold_in(key, 1)))
    first = out[:, 0]
    freq = np.bincount(first, minlength=V) / TRIALS
    # 4000 trials: ~3 sigma of a p=0.2 bin is ~0.019.
    np.testing.assert_allclose(freq, p0, atol=0.03)


@pytest.fixture(scope="module")
def tiny_eagle_dir(tmp_path_factory, tiny_llama_dir):
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, LlamaConfig, LlamaForCausalLM

    target_cfg = AutoConfig.from_pretrained(tiny_llama_dir)
    cfg = LlamaConfig(
        vocab_size=target_cfg.vocab_size,
        hidden_size=target_cfg.hidden_size,
        intermediate_size=target_cfg.intermediate_size,
        num_hidden_layers=1,
        num_attention_heads=target_cfg.num_attention_heads,
        num_key_value_heads=target_cfg.num_key_value_heads,
        max_position_embeddings=target_cfg.max_position_embeddings,
    )
    torch.manual_seed(3)
    model = LlamaForCausalLM(cfg)
    sd = {k: v for k, v in model.state_dict().items()
          if k.startswith("model.layers.0.") and "rotary" not in k}
    H = cfg.hidden_size
    sd["fc.weight"] = torch.randn(H, 2 * H) * 0.02
    path = tmp_path_factory.mktemp("tiny_eagle_s")
    save_file(sd, str(path / "model.safetensors"))
    cfg.save_pretrained(path)
    return str(path)


def _make_spec_llm(tiny_llama_dir, tiny_eagle_dir):
    from vllm_neuron_tpu import LLM
    return LLM(tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               speculative_config={"model": tiny_eagle_dir,
                                   "method": "eagle",
                                   "num_speculative_tokens": 3})


@pytest.fixture(scope="module")
def spec_llm(tiny_llama_dir, tiny_eagle_dir):
    return _make_spec_llm(tiny_llama_dir, tiny_eagle_dir)


def test_engine_spec_sampling_deterministic_and_progresses(
        spec_llm, tiny_llama_dir, tiny_eagle_dir):
    """Non-greedy requests keep speculating: two FRESH engines with the
    same seed replay identical step sequences => identical streams (on the
    SAME engine a second unseeded call intentionally differs, vLLM
    semantics); output length reaches max_tokens (acceptance machinery
    sound end to end)."""
    from vllm_neuron_tpu import SamplingParams
    sp = SamplingParams(temperature=0.9, top_p=0.95, max_tokens=24,
                        ignore_eos=True)
    prompts = [{"prompt_token_ids": [11, 12, 13, 14, 15]},
               {"prompt_token_ids": [40, 41, 42]}]
    a = spec_llm.generate(prompts, sp)
    fresh = _make_spec_llm(tiny_llama_dir, tiny_eagle_dir)
    b = fresh.generate(prompts, sp)
    for ra, rb in zip(a, b):
        ta = list(ra.outputs[0].token_ids)
        tb = list(rb.outputs[0].token_ids)
        assert ta == tb
        assert len(ta) == 24


def test_engine_spec_greedy_unchanged_vs_hf(spec_llm, tiny_llama_dir):
    """Greedy through the sampling-acceptance path still matches HF."""
    from tests.conftest import hf_greedy

    from vllm_neuron_tpu import SamplingParams
    prompt = [3, 9, 27, 81, 7]
    out = spec_llm.generate(
        {"prompt_token_ids": prompt},
        SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True))[0]
    ref = hf_greedy(tiny_llama_dir, prompt, 16)
    assert list(out.outputs[0].token_ids) == ref
