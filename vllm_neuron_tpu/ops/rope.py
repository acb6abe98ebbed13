# SPDX-License-Identifier: Apache-2.0
"""Rotary position embeddings (HF rotate-half convention, incl. Llama-3
frequency scaling) computed on the fly from positions — no cached tables, so
any bucketed sequence length jits to the same program shape."""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(head_dim: int, rope_theta: float,
                     rope_scaling: Optional[dict],
                     max_position_embeddings: Optional[int] = None
                     ) -> np.ndarray:
    """Static (host-side) inverse frequencies, with optional Llama-3 scaling.

    Matches HF ``ROPE_INIT_FUNCTIONS['llama3']`` semantics so checkpoints load
    without permutation.
    """
    inv_freq = 1.0 / (rope_theta**(np.arange(0, head_dim, 2, dtype=np.float64)
                                   / head_dim))
    if rope_scaling:
        rope_type = rope_scaling.get("rope_type",
                                     rope_scaling.get("type", "default"))
        if rope_type == "llama3":
            factor = rope_scaling["factor"]
            low = rope_scaling["low_freq_factor"]
            high = rope_scaling["high_freq_factor"]
            orig_max = rope_scaling["original_max_position_embeddings"]
            wavelen = 2 * math.pi / inv_freq
            low_wl = orig_max / low
            high_wl = orig_max / high
            scaled = inv_freq / factor
            smooth = (orig_max / wavelen - low) / (high - low)
            smoothed = (1 - smooth) * scaled + smooth * inv_freq
            inv_freq = np.where(wavelen > low_wl, scaled, inv_freq)
            is_medium = (wavelen <= low_wl) & (wavelen >= high_wl)
            inv_freq = np.where(is_medium, smoothed, inv_freq)
        elif rope_type == "yarn":
            # HF ROPE_INIT_FUNCTIONS['yarn'] semantics (long-context
            # Qwen-2.5 class checkpoints): interpolate low frequencies,
            # extrapolate high, linear ramp between correction dims.
            factor = rope_scaling["factor"]
            # HF treats original_max as optional, falling back to the
            # config's max_position_embeddings.
            orig_max = rope_scaling.get(
                "original_max_position_embeddings",
                max_position_embeddings)
            if orig_max is None:
                raise ValueError(
                    "yarn rope_scaling needs original_max_position_"
                    "embeddings (or pass max_position_embeddings)")
            beta_fast = rope_scaling.get("beta_fast", 32)
            beta_slow = rope_scaling.get("beta_slow", 1)

            def corr_dim(n_rot):
                return (head_dim * math.log(
                    orig_max / (n_rot * 2 * math.pi))) / (
                        2 * math.log(rope_theta))

            low = max(math.floor(corr_dim(beta_fast)), 0)
            high = min(math.ceil(corr_dim(beta_slow)), head_dim - 1)
            if low == high:
                high += 0.001
            ramp = np.clip((np.arange(head_dim // 2, dtype=np.float64) -
                            low) / (high - low), 0, 1)
            extrap = 1.0 - ramp
            inv_freq = (inv_freq / factor) * (1 - extrap) + inv_freq * extrap
        elif rope_type in ("default", None):
            pass
        elif rope_type == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        else:
            raise NotImplementedError(f"rope_type {rope_type!r}")
    return inv_freq.astype(np.float32)


def rope_attention_scaling(rope_scaling: Optional[dict]) -> float:
    """cos/sin magnitude factor (HF ``attention_scaling``): 1.0 for
    default/linear/llama3; yarn uses 0.1*ln(factor)+1 (or the config's
    explicit ``attention_factor``)."""
    if not rope_scaling:
        return 1.0
    rope_type = rope_scaling.get("rope_type",
                                 rope_scaling.get("type", "default"))
    if rope_type != "yarn":
        return 1.0
    af = rope_scaling.get("attention_factor")
    if af is not None:
        return float(af)
    factor = rope_scaling["factor"]
    return float(0.1 * math.log(factor) + 1.0) if factor > 1 else 1.0


def apply_rope(q: jax.Array, k: jax.Array, positions: jax.Array,
               inv_freq: jax.Array,
               attention_scaling: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Apply rotary embeddings.

    q: [..., Hq, D]; k: [..., Hkv, D]; positions: [...] int32 (same leading
    shape — e.g. flat ragged [N] or batched [B, T]); inv_freq: [D/2] f32.
    Rotation is computed in float32 (HF does the same) and cast back to the
    input dtype.
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., D/2]
    cos = jnp.cos(angles) * attention_scaling
    sin = jnp.sin(angles) * attention_scaling
    # HF convention: cos/sin duplicated over both halves; broadcast over the
    # heads axis.
    cos = jnp.concatenate([cos, cos], axis=-1)[..., None, :]  # [..., 1, D]
    sin = jnp.concatenate([sin, sin], axis=-1)[..., None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
        return (xf * cos + rotated * sin).astype(x.dtype)

    return rot(q), rot(k)
