# SPDX-License-Identifier: Apache-2.0
"""Speculative-decoding rejection sampling (on-device).

Lifts Eagle speculation from greedy-only to the full temperature/top-k/top-p
sampling surface (reference parity: fused speculation + dynamic on-device
sampling enabled simultaneously, vllm-neuron README.md:93; fused spec output
contract, neuronx_distributed_model_loader.py:308-334).

Standard speculative sampling (Leviathan et al.): the draft proposes
d_j ~ q_j, the target accepts with probability min(1, p_j(d_j)/q_j(d_j));
at the first rejection the output token is resampled from the residual
normalize(max(p_j - q_j, 0)); if all K drafts are accepted a bonus token is
sampled from p_K. This preserves the target distribution EXACTLY — and for
greedy rows (temperature == 0) the filtered target distribution is an exact
one-hot, so acceptance degenerates to d_j == argmax(p_j) and the resample
to argmax: bit-identical to greedy verification.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_neuron_tpu.sampling.params import MAX_ON_DEVICE_TOP_K


def filtered_probs(logits: jax.Array, temperature: jax.Array,
                   top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Full-vocab probabilities after temperature/top-k/top-p filtering.

    logits: [S, V] f32; temperature/top_p: [S]; top_k: [S] int32 (-1 =
    disabled). Filtering semantics match sample_tokens (ondevice.py): the
    top-``MAX_ON_DEVICE_TOP_K`` window, temperature scaling, top-k mask,
    top-p by cumulative-before over the sorted window. Rows with
    temperature <= 0 return an EXACT one-hot of argmax (first-max ties).
    Returns [S, V] f32, zeros outside the kept set.
    """
    S, V = logits.shape
    K = min(MAX_ON_DEVICE_TOP_K, V)
    top_vals, top_idx = jax.lax.top_k(logits, K)  # [S, K] sorted desc
    j = jnp.arange(K, dtype=jnp.int32)[None, :]

    k_eff = jnp.where(top_k <= 0, K, jnp.minimum(top_k, K))[:, None]
    keep = j < k_eff
    safe_temp = jnp.where(temperature > 0, temperature, 1.0)[:, None]
    scaled = top_vals / safe_temp
    win = jax.nn.softmax(jnp.where(keep, scaled, -jnp.inf), axis=-1)
    cum_before = jnp.cumsum(win, axis=-1) - win
    keep &= cum_before < top_p[:, None]
    win = jax.nn.softmax(jnp.where(keep, scaled, -jnp.inf), axis=-1)

    full = jnp.zeros((S, V), win.dtype)
    rows = jnp.arange(S, dtype=jnp.int32)[:, None]
    full = full.at[rows, top_idx].set(win)

    # Greedy rows: exact one-hot of argmax over the FULL logits (same
    # first-max tie-breaking as the greedy path in sample_tokens, so the
    # spec pipeline is bit-identical to greedy verification).
    am = jnp.argmax(logits, axis=-1)
    onehot = (jnp.arange(V, dtype=am.dtype)[None] ==
              am[:, None]).astype(win.dtype)
    return jnp.where((temperature <= 0)[:, None], onehot, full)


def sample_from_probs(probs: jax.Array, key: jax.Array) -> jax.Array:
    """Categorical sample per row from [.., V] probabilities (Gumbel-max;
    zero-probability entries can never win)."""
    g = jax.random.gumbel(key, probs.shape, jnp.float32)
    return jnp.argmax(jnp.where(probs > 0, jnp.log(probs) + g, -jnp.inf),
                      axis=-1).astype(jnp.int32)


def spec_acceptance(drafted: jax.Array, q_probs: jax.Array,
                    p_probs: jax.Array, key: jax.Array) -> jax.Array:
    """Rejection-sample the accepted token sequence.

    drafted: [N, K] draft tokens (d_j ~ q_j); q_probs: [N, K, V] the draft's
    filtered distributions; p_probs: [N, K+1, V] the target's filtered
    distributions at the K+1 verified positions. Returns tokens_out
    [N, K+1]: the accepted prefix, then the resampled/bonus token, then -1.
    """
    N, K = drafted.shape
    T = K + 1
    u_key, r_key, b_key = jax.random.split(key, 3)

    p_at_d = jnp.take_along_axis(p_probs[:, :K], drafted[..., None],
                                 axis=-1)[..., 0]  # [N, K]
    q_at_d = jnp.take_along_axis(q_probs, drafted[..., None],
                                 axis=-1)[..., 0]
    ratio = p_at_d / jnp.maximum(q_at_d, 1e-20)
    u = jax.random.uniform(u_key, (N, K), jnp.float32)
    accept = u < jnp.minimum(ratio, 1.0)  # [N, K]
    acc = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    a = jnp.sum(acc, axis=1)  # accepted draft count, 0..K

    # Residual distributions at every draft position (selected at j == a).
    res = jnp.maximum(p_probs[:, :K] - q_probs, 0.0)
    res_sum = jnp.sum(res, axis=-1, keepdims=True)
    res = jnp.where(res_sum > 0, res / jnp.maximum(res_sum, 1e-20),
                    p_probs[:, :K])
    resampled = sample_from_probs(res, r_key)              # [N, K]
    bonus = sample_from_probs(p_probs[:, K], b_key)        # [N]
    cand = jnp.concatenate([resampled, bonus[:, None]], axis=1)  # [N, T]

    j_idx = jnp.arange(T, dtype=jnp.int32)[None]
    return jnp.where(
        j_idx < a[:, None],
        jnp.pad(drafted, ((0, 0), (0, 1))),
        jnp.where(j_idx == a[:, None], cand, -1))
