# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA delta computation for the unified ragged serving step.

The reference stack exposes LoRA interfaces but raises NotImplementedError at
runtime (reference: vllm_neuron/worker/neuron_worker.py:123-138,
neuronx_distributed_model_runner.py:152-154, :834-846 — SURVEY.md V9). This
module implements the real thing, TPU-native: all registered adapters are
stacked into ONE pair of weight tensors per target projection,

    a: [G, in, r]   b: [G, r, out]      G = 1 + num_adapters

with group 0 all-zeros (= "no adapter"), and the per-token delta

    delta[i] = x[i] @ a[g_i] @ b[g_i]

is computed by sorting the flat token stream by adapter id and running two
``jax.lax.ragged_dot`` grouped GEMMs — exactly the MoE machinery
(ops/moe.py), so tokens for different adapters batch onto the MXU in one
static-shaped program with no per-adapter dispatch. Sorting happens once per
step (the permutation is shared by every layer and every target projection).

A dense one-hot einsum fallback keeps tiny CPU tests exact and supports
platforms where ragged_dot lowering is unavailable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LoRASortCtx:
    """Per-step token permutation shared by all LoRA applications.

    Built once per forward from the [N] adapter-id vector; every
    ``lora_delta`` call reuses it.
    """
    sort_idx: jax.Array  # [N] int32: ragged order -> sorted-by-adapter order
    inv_idx: jax.Array  # [N] int32: inverse permutation
    group_sizes: jax.Array  # [G] int32: tokens per adapter group


def lora_sort_ctx(adapter_ids: jax.Array, num_groups: int) -> LoRASortCtx:
    """adapter_ids: [N] int32 in [0, num_groups); 0 = no adapter."""
    sort_idx = jnp.argsort(adapter_ids, stable=True).astype(jnp.int32)
    inv_idx = jnp.argsort(sort_idx).astype(jnp.int32)
    group_sizes = jnp.bincount(adapter_ids,
                               length=num_groups).astype(jnp.int32)
    return LoRASortCtx(sort_idx, inv_idx, group_sizes)


def _delta_ragged(x: jax.Array, a: jax.Array, b: jax.Array,
                  ctx: LoRASortCtx) -> jax.Array:
    xs = x[ctx.sort_idx].astype(a.dtype)  # [N, in] grouped by adapter
    t = jax.lax.ragged_dot(xs, a, ctx.group_sizes,
                           preferred_element_type=jnp.float32)
    t = t.astype(a.dtype)  # [N, r]
    d = jax.lax.ragged_dot(t, b, ctx.group_sizes,
                           preferred_element_type=jnp.float32)
    return d[ctx.inv_idx]  # [N, out] f32


def _delta_dense(x: jax.Array, a: jax.Array, b: jax.Array,
                 ctx: LoRASortCtx) -> jax.Array:
    # Recover per-token group ids from the sort ctx: token i's group is the
    # group of its sorted position. [N] one-hot over G, O(G) overhead.
    G = a.shape[0]
    starts = jnp.cumsum(ctx.group_sizes) - ctx.group_sizes  # [G]
    pos = jnp.arange(x.shape[0], dtype=jnp.int32)
    sorted_gid = jnp.sum((pos[:, None] >= starts[None, :]).astype(jnp.int32),
                         axis=1) - 1
    gid = sorted_gid[ctx.inv_idx]  # [N]
    onehot = jax.nn.one_hot(gid, G, dtype=a.dtype)  # [N, G]
    xf = x.astype(a.dtype)
    t = jnp.einsum("nh,ghr,ng->nr", xf, a, onehot)  # [N, r]
    return jnp.einsum("nr,gro,ng->no", t.astype(a.dtype), b,
                      onehot).astype(jnp.float32)


def lora_delta(x: jax.Array, a: jax.Array, b: jax.Array, ctx: LoRASortCtx,
               backend: Optional[str] = None) -> jax.Array:
    """x: [N, in]; a: [G, in, r]; b: [G, r, out] (adapter scale pre-folded
    into b). Returns the summed low-rank delta [N, out] in x.dtype."""
    if backend == "dense":
        d = _delta_dense(x, a, b, ctx)
    else:
        d = _delta_ragged(x, a, b, ctx)
    return d.astype(x.dtype)
