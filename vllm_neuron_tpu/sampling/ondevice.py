# SPDX-License-Identifier: Apache-2.0
"""On-device (fused-in-program) batched sampling.

TPU-native equivalent of NxDI's on-device sampling graph (reference:
``OnDeviceSamplingConfig(dynamic=True)``, vllm_neuron/worker/
neuronx_distributed_model_loader.py:731-732; per-request ``[B, 3]`` params
tensor built at model_runner.py:1106-1140; forward returns token ids instead
of logits, model_loader.py:350-351). Sampling stays inside the jitted step,
so decode never ships a ``[B, V]`` logits tensor to the host.

Semantics (matching the host sampler / reference behavior):
- temperature == 0 is greedy and must equal top_k == 1 (reference tiny test
  test_dynamic_sampling.py temp0-eq-topk1);
- top_k is clamped to MAX_ON_DEVICE_TOP_K = 256 (reference
  _MAX_NEURON_SAMPLING_TOP_K, model_runner.py:74); requests needing more
  (or penalties / seeds / logprobs) take the host path instead;
- top_k <= 0 means disabled (all of the top-256 window);
- top_p filters by cumulative probability over the sorted window, always
  keeping the most probable token.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vllm_neuron_tpu.sampling.params import MAX_ON_DEVICE_TOP_K


@functools.cache
def _topk_chunks() -> int:
    """Vocab chunks for the two-stage exact top-k (0 disables). The lowered
    XLA TopK over [S, 128k] f32 costs ~7.9 ms at b80 (round-5 profile);
    splitting the vocab into nc chunks, taking top-K per chunk, and
    re-top-K'ing the nc*K merged candidates is exact (any global top-K
    element is top-K within its chunk) and lets the big sort run on a
    fraction of the data. Chip A/B (b80 8B temperature=0.8, median-of-2):
    nc=8 2231.9 decode-phase vs 2128.6 plain (+4.9%, −1.7 ms/step);
    greedy batches skip top-k entirely via lax.cond, unaffected."""
    import os
    return int(os.environ.get("VLLM_TPU_TOPK_CHUNKS", "8"))


def _top_k(logits: jax.Array, K: int) -> tuple[jax.Array, jax.Array]:
    """lax.top_k, optionally two-stage over vocab chunks (exact)."""
    S, V = logits.shape
    nc = _topk_chunks()
    if nc <= 1 or V % nc != 0 or V // nc < K:
        return jax.lax.top_k(logits, K)
    cv = V // nc
    cvals, cidx = jax.lax.top_k(logits.reshape(S * nc, cv), K)
    base = (jnp.arange(nc, dtype=jnp.int32) * cv)[None, :, None]
    gidx = (cidx.reshape(S, nc, K) + base).reshape(S, nc * K)
    cand = cvals.reshape(S, nc * K)
    vals, pos = jax.lax.top_k(cand, K)
    return vals, jnp.take_along_axis(gidx, pos, axis=1)


def sample_tokens(logits: jax.Array, temperature: jax.Array,
                  top_k: jax.Array, top_p: jax.Array,
                  step_key: jax.Array) -> jax.Array:
    """Sample one token per row.

    logits: [S, V] float32; temperature/top_p: [S] f32; top_k: [S] int32
    (-1 = disabled); step_key: jax PRNG key for this step. Returns [S] int32.

    Fully vectorized: top-256 window -> temperature -> top-k mask -> top-p
    mask -> Gumbel-max. Greedy rows (temp == 0) take pure argmax.

    The whole top-k machinery sits under a ``lax.cond`` on ``any(temp >
    0)``: XLA conditionals execute only the taken branch, and the lowered
    TopK custom-call over [S, V] f32 measured **7.9 ms/step at b80/V=128k
    — 26% of the whole decode step** (round-5 perfetto profile,
    perf/step_profile.py) while serving an all-greedy batch that never
    used its output. All-greedy steps now pay one argmax (~0.07 ms);
    batches with any sampled row take the full path unchanged.
    """
    S, V = logits.shape
    K = min(MAX_ON_DEVICE_TOP_K, V)

    # Greedy via direct argmax over the full vocab: first-max tie-breaking,
    # bit-identical to the host sampler's np.argmax.
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sampled(_):
        top_vals, top_idx = _top_k(logits, K)  # [S, K] sorted desc
        j = jnp.arange(K, dtype=jnp.int32)[None, :]  # [1, K]

        # top-k mask (disabled => full window).
        k_eff = jnp.where(top_k <= 0, K, jnp.minimum(top_k, K))[:, None]
        keep = j < k_eff

        # Temperature (greedy rows guarded; resolved by the argmax select
        # below).
        safe_temp = jnp.where(temperature > 0, temperature, 1.0)[:, None]
        scaled = top_vals / safe_temp

        # top-p over the sorted window: keep tokens while the cumulative
        # probability BEFORE them is < top_p (always keeps rank 0).
        probs = jax.nn.softmax(jnp.where(keep, scaled, -jnp.inf), axis=-1)
        cum_before = jnp.cumsum(probs, axis=-1) - probs
        keepp = keep & (cum_before < top_p[:, None])

        masked = jnp.where(keepp, scaled, -jnp.inf)
        gumbel = jax.random.gumbel(step_key, (S, K), dtype=jnp.float32)
        sampled_rank = jnp.argmax(masked + gumbel, axis=-1)
        sampled = jnp.take_along_axis(top_idx, sampled_rank[:, None],
                                      axis=-1)[:, 0]
        return jnp.where(temperature <= 0, greedy, sampled)

    return jax.lax.cond(jnp.any(temperature > 0), _sampled,
                        lambda _: greedy, None)
