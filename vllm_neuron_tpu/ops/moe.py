# SPDX-License-Identifier: Apache-2.0
"""Mixture-of-Experts MLP (Qwen3-MoE / Llama-4 class).

TPU-native equivalent of the reference stack's NxDI blockwise MoE matmul
(reference: blockwise_matmul_config with block_parallel + DMA-token skipping,
test/e2e/offline/test_offline_e2e.py:58-69; qwen3_moe arch mapping at
worker/neuronx_distributed_model_loader.py:647-648).

Production path: tokens are sorted by expert and run through grouped matmuls
(``jax.lax.ragged_dot`` — XLA's native grouped GEMM, which tiles onto the MXU
with contiguous per-expert row blocks). A dense one-hot einsum fallback keeps
tiny-scale CPU tests exact and simple. Expert weights shard over the mesh
"model" axis on their FFN dimension (EP-over-TP layout; a dedicated "expert"
axis can map the same arrays with no code change).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def route(x: jax.Array, router_w: jax.Array, top_k: int,
          norm_topk_prob: bool) -> tuple[jax.Array, jax.Array]:
    """x: [N, H]; router_w: [H, E]. Returns (weights [N, k] f32,
    expert_ids [N, k] i32). Softmax over all experts, then top-k
    (Qwen3/Mixtral convention), optionally renormalized."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def _moe_dense(x, weights, ids, we_gate, we_up, we_down):
    """One-hot dense fallback: exact, O(E) FLOPs overhead — test scale."""
    N, H = x.shape
    E = we_gate.shape[0]
    k = ids.shape[1]
    onehot = jax.nn.one_hot(ids, E, dtype=jnp.float32)  # [N, k, E]
    combine = jnp.einsum("nke,nk->ne", onehot, weights)  # [N, E]
    xf = x.astype(we_gate.dtype)
    gate = jnp.einsum("nh,ehi->nei", xf, we_gate)
    up = jnp.einsum("nh,ehi->nei", xf, we_up)
    act = jax.nn.silu(gate) * up
    out = jnp.einsum("nei,eih->neh", act, we_down)
    return jnp.einsum("neh,ne->nh", out.astype(jnp.float32), combine)


def _moe_ragged(x, weights, ids, we_gate, we_up, we_down):
    """Sorted grouped-matmul path: flatten (token, expert) pairs, sort by
    expert, ragged_dot per projection, unsort, combine."""
    N, H = x.shape
    E = we_gate.shape[0]
    k = ids.shape[1]
    flat_ids = ids.reshape(-1)  # [N*k]
    order = jnp.argsort(flat_ids)  # stable
    inv_order = jnp.argsort(order)
    token_idx = jnp.arange(N * k, dtype=jnp.int32) // k
    xs = x[token_idx[order]]  # [N*k, H] sorted by expert
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)
    gate = jax.lax.ragged_dot(xs, we_gate, group_sizes,
                              preferred_element_type=jnp.float32)
    up = jax.lax.ragged_dot(xs, we_up, group_sizes,
                            preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = jax.lax.ragged_dot(act, we_down, group_sizes,
                             preferred_element_type=jnp.float32)  # [N*k, H]
    out = out[inv_order].reshape(N, k, H)
    return jnp.einsum("nkh,nk->nh", out, weights)


def moe_mlp_llama4(x: jax.Array, router_w: jax.Array, gate_up: jax.Array,
                   down: jax.Array, top_k: int,
                   backend: Optional[str] = None) -> jax.Array:
    """Llama-4 MoE: router scores are sigmoid(top-k logits) applied to the
    EXPERT INPUT (x * score), outputs summed over the selected experts
    (shared expert handled by the caller). gate_up: [E, H, 2I] fused;
    down: [E, I, H]."""
    N, H = x.shape
    E = gate_up.shape[0]
    I = gate_up.shape[2] // 2
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32),
                     preferred_element_type=jnp.float32)  # [N, E]
    top_vals, ids = jax.lax.top_k(logits, top_k)
    scores = jax.nn.sigmoid(top_vals)  # [N, k]
    if backend is None:
        backend = "ragged" if jax.devices()[0].platform == "tpu" else "dense"
    xf = x.astype(gate_up.dtype)
    if backend == "dense":
        onehot = jax.nn.one_hot(ids, E, dtype=jnp.float32)  # [N, k, E]
        xin = xf[:, None] * scores[:, :, None].astype(xf.dtype)  # [N, k, H]
        gu = jnp.einsum("nkh,ehi->nkei", xin, gate_up)
        gate, up = jnp.split(gu, 2, axis=-1)
        act = jax.nn.silu(gate) * up
        out = jnp.einsum("nkei,eih->nkeh", act, down)
        out = jnp.einsum("nkeh,nke->nh", out.astype(jnp.float32), onehot)
        return out.astype(x.dtype)
    flat_ids = ids.reshape(-1)
    order = jnp.argsort(flat_ids)
    inv_order = jnp.argsort(order)
    token_idx = jnp.arange(N * top_k, dtype=jnp.int32) // top_k
    xin = (xf * 1.0)[token_idx] * scores.reshape(-1, 1).astype(xf.dtype)
    xs = xin[order]
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)
    gu = jax.lax.ragged_dot(xs, gate_up, group_sizes,
                            preferred_element_type=jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = jax.lax.ragged_dot(act, down, group_sizes,
                             preferred_element_type=jnp.float32)
    out = out[inv_order].reshape(N, top_k, H).sum(axis=1)
    return out.astype(x.dtype)


def moe_mlp(x: jax.Array, router_w: jax.Array, we_gate: jax.Array,
            we_up: jax.Array, we_down: jax.Array, top_k: int,
            norm_topk_prob: bool = True,
            backend: Optional[str] = None) -> jax.Array:
    """x: [N, H]; router_w: [H, E]; we_gate/we_up: [E, H, I];
    we_down: [E, I, H]. Returns [N, H] in x.dtype."""
    weights, ids = route(x, router_w, top_k, norm_topk_prob)
    if backend is None:
        backend = "ragged" if jax.devices()[0].platform == "tpu" else "dense"
    if backend == "ragged":
        out = _moe_ragged(x, weights, ids, we_gate, we_up, we_down)
    else:
        out = _moe_dense(x, weights, ids, we_gate, we_up, we_down)
    return out.astype(x.dtype)
