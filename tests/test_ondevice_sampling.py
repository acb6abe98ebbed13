# SPDX-License-Identifier: Apache-2.0
"""On-device sampler distribution semantics (reference analogue:
test/tiny/test_dynamic_sampling.py — temp0==topk1, diversity, temperature
effect; plus statistical top-k/top-p mask checks against the math)."""
import numpy as np
import jax
import jax.numpy as jnp

from vllm_neuron_tpu.sampling.ondevice import sample_tokens


def _sample_many(logits_row, temperature, top_k, top_p, n=2000):
    S = 1
    logits = jnp.asarray(logits_row, jnp.float32)[None]
    temp = jnp.full((S,), temperature, jnp.float32)
    tk = jnp.full((S,), top_k, jnp.int32)
    tp = jnp.full((S,), top_p, jnp.float32)
    f = jax.jit(lambda key: sample_tokens(logits, temp, tk, tp, key))
    out = []
    for i in range(n):
        out.append(int(f(jax.random.PRNGKey(i))[0]))
    return np.asarray(out)


def test_greedy_is_argmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=64)
    got = _sample_many(logits, 0.0, -1, 1.0, n=8)
    assert (got == np.argmax(logits)).all()


def test_top_k_mask():
    """With top_k=3, only the 3 highest-logit tokens are ever sampled."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=64)
    allowed = set(np.argsort(logits)[-3:])
    got = _sample_many(logits, 1.0, 3, 1.0, n=300)
    assert set(got) <= allowed
    assert len(set(got)) > 1  # actually samples, not argmax


def test_top_p_mask():
    """top_p keeps only the smallest prefix of sorted probs covering p."""
    logits = np.full(64, -10.0)
    logits[:4] = [5.0, 4.0, 3.0, -5.0]
    # softmax mass: token0 ~0.72, token1 ~0.27 -> top_p=0.8 keeps {0, 1}.
    got = _sample_many(logits, 1.0, -1, 0.8, n=300)
    assert set(got) <= {0, 1}
    assert {0, 1} <= set(got)


def test_temperature_sharpens():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=64) * 2
    hot = _sample_many(logits, 2.0, -1, 1.0, n=500)
    cold = _sample_many(logits, 0.3, -1, 1.0, n=500)
    assert len(set(cold)) < len(set(hot))


def test_sampling_frequencies_track_probs():
    """Empirical frequencies approximate softmax(logits/T) over the top-k
    window (sanity of the Gumbel-max construction)."""
    logits = np.array([2.0, 1.0, 0.0] + [-30.0] * 61)
    got = _sample_many(logits, 1.0, -1, 1.0, n=3000)
    freq = np.bincount(got, minlength=64)[:3] / 3000
    expect = np.exp(logits[:3]) / np.exp(logits[:3]).sum()
    np.testing.assert_allclose(freq, expect, atol=0.05)


def test_chunked_topk_exact(monkeypatch):
    """VLLM_TPU_TOPK_CHUNKS two-stage top-k is EXACT vs lax.top_k (any
    global top-K element is top-K within its vocab chunk); non-divisible
    or too-small configurations fall back."""
    import jax
    import numpy as np

    from vllm_neuron_tpu.sampling import ondevice

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((5, 2048)).astype(np.float32))
    ref_v, ref_i = jax.lax.top_k(logits, 256)
    for nc in ("2", "4", "8", "3", "64"):  # 3: non-divisible; 64: V/nc<K
        monkeypatch.setenv("VLLM_TPU_TOPK_CHUNKS", nc)
        ondevice._topk_chunks.cache_clear()
        v, i = ondevice._top_k(logits, 256)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
        if nc in ("2", "4", "8"):
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    ondevice._topk_chunks.cache_clear()
