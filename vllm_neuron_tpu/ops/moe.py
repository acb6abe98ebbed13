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
from jax.sharding import Mesh, PartitionSpec as P

from vllm_neuron_tpu.parallel.mesh import EXPERT_AXIS, MODEL_AXIS


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


def _dq(w, scale, dtype):
    """Dequantize a whole expert stack [E, K, N] (dense/test path; the
    ragged path scales per-row after the dot instead)."""
    if scale is None:
        return w
    return (w.astype(jnp.float32) * scale).astype(dtype)


def _rdot(xs, w, scale, sid, group_sizes):
    """ragged_dot with optional per-channel expert quantization: weights
    stay int8/fp8 in HBM (the dtype convert fuses into the dot's operand
    read, as in ops/quant.py); the per-channel scale is applied AFTER the
    dot, gathered per sorted row's expert (sid [M])."""
    out = jax.lax.ragged_dot(xs, w if scale is None else w.astype(xs.dtype),
                             group_sizes,
                             preferred_element_type=jnp.float32)
    if scale is not None:
        out = out * scale[sid, 0]  # [M, N] f32
    return out


def _moe_dense(x, weights, ids, we_gate, we_up, we_down, scales=None):
    """One-hot dense fallback: exact, O(E) FLOPs overhead — test scale."""
    N, H = x.shape
    E = we_gate.shape[0]
    k = ids.shape[1]
    gs, us, ds = scales or (None, None, None)
    we_gate = _dq(we_gate, gs, x.dtype)
    we_up = _dq(we_up, us, x.dtype)
    we_down = _dq(we_down, ds, x.dtype)
    onehot = jax.nn.one_hot(ids, E, dtype=jnp.float32)  # [N, k, E]
    combine = jnp.einsum("nke,nk->ne", onehot, weights)  # [N, E]
    xf = x.astype(we_gate.dtype)
    gate = jnp.einsum("nh,ehi->nei", xf, we_gate)
    up = jnp.einsum("nh,ehi->nei", xf, we_up)
    act = jax.nn.silu(gate) * up
    out = jnp.einsum("nei,eih->neh", act, we_down)
    return jnp.einsum("neh,ne->nh", out.astype(jnp.float32), combine)


def _moe_ragged(x, weights, ids, we_gate, we_up, we_down, scales=None):
    """Sorted grouped-matmul path: flatten (token, expert) pairs, sort by
    expert, ragged_dot per projection, unsort, combine."""
    N, H = x.shape
    E = we_gate.shape[0]
    k = ids.shape[1]
    gs, us, ds = scales or (None, None, None)
    flat_ids = ids.reshape(-1)  # [N*k]
    order = jnp.argsort(flat_ids)  # stable
    inv_order = jnp.argsort(order)
    token_idx = jnp.arange(N * k, dtype=jnp.int32) // k
    xs = x[token_idx[order]]  # [N*k, H] sorted by expert
    sid = flat_ids[order]  # [N*k] expert of each sorted row
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)
    gate = _rdot(xs, we_gate, gs, sid, group_sizes)
    up = _rdot(xs, we_up, us, sid, group_sizes)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = _rdot(act, we_down, ds, sid, group_sizes)  # [N*k, H]
    out = out[inv_order].reshape(N, k, H)
    return jnp.einsum("nkh,nk->nh", out, weights)


def moe_mlp_llama4(x: jax.Array, router_w: jax.Array, gate_up: jax.Array,
                   down: jax.Array, top_k: int,
                   backend: Optional[str] = None,
                   ep_mesh: Optional[Mesh] = None,
                   scales: Optional[tuple] = None) -> jax.Array:
    """Llama-4 MoE: router scores are sigmoid(top-k logits) applied to the
    EXPERT INPUT (x * score), outputs summed over the selected experts
    (shared expert handled by the caller). gate_up: [E, H, 2I] fused;
    down: [E, I, H]. scales: optional (gate_up_scale [E, 1, 2I],
    down_scale [E, 1, H]) per-channel quantization scales."""
    N, H = x.shape
    E = gate_up.shape[0]
    gus, ds = scales or (None, None)
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32),
                     preferred_element_type=jnp.float32)  # [N, E]
    top_vals, ids = jax.lax.top_k(logits, top_k)
    scores = jax.nn.sigmoid(top_vals)  # [N, k]
    if ep_mesh is not None and ep_mesh.shape.get(EXPERT_AXIS, 1) > 1:
        return _moe_ep_llama4(x, scores, ids.astype(jnp.int32), gate_up,
                              down, ep_mesh, backend,
                              scales).astype(x.dtype)
    if backend is None:
        backend = "ragged" if jax.devices()[0].platform == "tpu" else "dense"
    if backend == "dense":
        gate_up = _dq(gate_up, gus, x.dtype)
        down = _dq(down, ds, x.dtype)
        xf = x.astype(gate_up.dtype)
        onehot = jax.nn.one_hot(ids, E, dtype=jnp.float32)  # [N, k, E]
        xin = xf[:, None] * scores[:, :, None].astype(xf.dtype)  # [N, k, H]
        gu = jnp.einsum("nkh,ehi->nkei", xin, gate_up)
        gate, up = jnp.split(gu, 2, axis=-1)
        act = jax.nn.silu(gate) * up
        out = jnp.einsum("nkei,eih->nkeh", act, down)
        out = jnp.einsum("nkeh,nke->nh", out.astype(jnp.float32), onehot)
        return out.astype(x.dtype)
    xf = x.astype(gate_up.dtype) if gus is None else x
    flat_ids = ids.reshape(-1)
    order = jnp.argsort(flat_ids)
    inv_order = jnp.argsort(order)
    token_idx = jnp.arange(N * top_k, dtype=jnp.int32) // top_k
    xin = (xf * 1.0)[token_idx] * scores.reshape(-1, 1).astype(xf.dtype)
    xs = xin[order]
    sid = flat_ids[order]
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)
    gu = _rdot(xs, gate_up, gus, sid, group_sizes)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = _rdot(act, down, ds, sid, group_sizes)
    out = out[inv_order].reshape(N, top_k, H).sum(axis=1)
    return out.astype(x.dtype)


def moe_mlp(x: jax.Array, router_w: jax.Array, we_gate: jax.Array,
            we_up: jax.Array, we_down: jax.Array, top_k: int,
            norm_topk_prob: bool = True,
            backend: Optional[str] = None,
            ep_mesh: Optional[Mesh] = None,
            scales: Optional[tuple] = None) -> jax.Array:
    """x: [N, H]; router_w: [H, E]; we_gate/we_up: [E, H, I];
    we_down: [E, I, H]. Returns [N, H] in x.dtype. With ``ep_mesh`` set
    (expert-axis size > 1) the expert compute runs under shard_map with
    experts partitioned over the "expert" mesh axis. scales: optional
    (gate_scale, up_scale, down_scale) per-channel [E, 1, N] quantization
    scales (reference MoE quant surface: model_loader.py:886-898)."""
    weights, ids = route(x, router_w, top_k, norm_topk_prob)
    if ep_mesh is not None and ep_mesh.shape.get(EXPERT_AXIS, 1) > 1:
        return _moe_ep(x, weights, ids, we_gate, we_up, we_down,
                       ep_mesh, backend, scales).astype(x.dtype)
    if backend is None:
        backend = "ragged" if jax.devices()[0].platform == "tpu" else "dense"
    if backend == "ragged":
        out = _moe_ragged(x, weights, ids, we_gate, we_up, we_down, scales)
    else:
        out = _moe_dense(x, weights, ids, we_gate, we_up, we_down, scales)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Expert parallelism (dedicated "expert" mesh axis; parallel/mesh.py).
#
# Design: the router runs replicated (tiny), then the expert FFN runs under
# shard_map manual over ("expert", "model"): each shard holds a contiguous
# slab of E/ep experts (x 1/tp of the FFN dim) and computes the contribution
# of ITS experts for every (token, expert) pair, masking pairs routed
# elsewhere; one psum over (expert[, model]) combines. This is the exact,
# dropless formulation — no capacity factor, no token dropping (the
# reference's blockwise MoE makes the same trade: block_parallel over the
# group, test/e2e/offline/test_offline_e2e.py:58-69). Weights memory scales
# 1/ep; the grouped matmul skips non-local pairs via zero-size ragged
# groups on the megablox path.
# ---------------------------------------------------------------------------


def _local_pairs(ids: jax.Array, weights: jax.Array, e_local: int):
    """Mask/remap global expert ids to this shard's slab [lo, lo+e_local).
    Returns (local_ids clamped to [0, e_local), pair weights zeroed for
    non-local pairs, selection mask)."""
    lo = jax.lax.axis_index(EXPERT_AXIS) * e_local
    lids = ids - lo
    sel = (lids >= 0) & (lids < e_local)
    return jnp.clip(lids, 0, e_local - 1), jnp.where(sel, weights, 0.0), sel


def _ep_ffn(xs: jax.Array, group_sizes: jax.Array, wg_l, wu_l, wd_l,
            scales=(None, None, None), sid=None):
    """Grouped FFN over a local expert slab: xs [M, H] sorted by local
    expert, group_sizes [E_local] (+ padding rows folded into the last
    group so every row has a defined group). scales/sid: optional
    per-channel expert quantization (foreign rows' garbage scales are
    discarded by the caller's zero combine weights)."""
    M = xs.shape[0]
    gs_l, us_l, ds_l = scales
    leftover = M - jnp.sum(group_sizes)
    group_sizes = group_sizes.at[-1].add(leftover)
    gate = _rdot(xs, wg_l, gs_l, sid, group_sizes)
    up = _rdot(xs, wu_l, us_l, sid, group_sizes)
    act = (jax.nn.silu(gate) * up).astype(xs.dtype)
    return _rdot(act, wd_l, ds_l, sid, group_sizes)  # [M, H]


def _moe_ep(x, weights, ids, we_gate, we_up, we_down, mesh: Mesh,
            backend: Optional[str], scales: Optional[tuple] = None):
    E, _, I = we_gate.shape
    ep = mesh.shape[EXPERT_AXIS]
    tp = mesh.shape[MODEL_AXIS]
    e_local = E // ep
    i_shard = MODEL_AXIS if I % tp == 0 else None
    psum_axes = (EXPERT_AXIS,) + ((MODEL_AXIS,) if i_shard else ())
    if backend is None:
        backend = "ragged" if jax.devices()[0].platform == "tpu" else "dense"
    gs, us, ds = scales or (None, None, None)
    quant = gs is not None

    def body(xl, w, ids, wg_l, wu_l, wd_l, *scl):
        lids, wl, sel = _local_pairs(ids, w, e_local)
        gs_l, us_l, ds_l = scl if quant else (None, None, None)
        if backend == "dense":
            wg_l = _dq(wg_l, gs_l, xl.dtype)
            wu_l = _dq(wu_l, us_l, xl.dtype)
            wd_l = _dq(wd_l, ds_l, xl.dtype)
            onehot = jax.nn.one_hot(lids, e_local, dtype=jnp.float32)
            combine = jnp.einsum("nke,nk->ne", onehot,
                                 wl.astype(jnp.float32))
            xf = xl.astype(wg_l.dtype)
            gate = jnp.einsum("nh,ehi->nei", xf, wg_l)
            up = jnp.einsum("nh,ehi->nei", xf, wu_l)
            act = jax.nn.silu(gate) * up
            out = jnp.einsum("nei,eih->neh", act, wd_l)
            out = jnp.einsum("neh,ne->nh", out.astype(jnp.float32), combine)
        else:
            N, k = ids.shape
            flat_l = lids.reshape(-1)
            # Sort local pairs by expert; foreign pairs sink to the end
            # (key e_local) and land in the padded last group with weight 0.
            key = jnp.where(sel.reshape(-1), flat_l, e_local)
            order = jnp.argsort(key)
            inv_order = jnp.argsort(order)
            token_idx = jnp.arange(N * k, dtype=jnp.int32) // k
            xs = xl[token_idx[order]]
            sid = jnp.clip(flat_l[order], 0, e_local - 1)
            group_sizes = jnp.bincount(
                jnp.where(sel.reshape(-1), flat_l, e_local),
                length=e_local).astype(jnp.int32)
            out = _ep_ffn(xs, group_sizes, wg_l, wu_l, wd_l,
                          (gs_l, us_l, ds_l), sid)
            out = out[inv_order].reshape(N, k, -1)
            out = jnp.einsum("nkh,nk->nh", out, wl.astype(jnp.float32))
        return jax.lax.psum(out, psum_axes)

    w_specs = (P(EXPERT_AXIS, None, i_shard),
               P(EXPERT_AXIS, None, i_shard),
               P(EXPERT_AXIS, i_shard, None))
    s_specs = (P(EXPERT_AXIS, None, i_shard),
               P(EXPERT_AXIS, None, i_shard),
               P(EXPERT_AXIS, None, None)) if quant else ()
    f = jax.shard_map(
        body, mesh=mesh, axis_names={EXPERT_AXIS, MODEL_AXIS},
        in_specs=(P(), P(), P()) + w_specs + s_specs,
        out_specs=P(), check_vma=False)
    args = (x, weights, ids, we_gate, we_up, we_down)
    if quant:
        args = args + (gs, us, ds)
    return f(*args)


def _moe_ep_llama4(x, scores, ids, gate_up, down, mesh: Mesh,
                   backend: Optional[str], scales: Optional[tuple] = None):
    """Llama-4 routed experts under EP: sigmoid score scales the expert
    INPUT; outputs sum over selected experts (weight 1 at combine)."""
    E, _, I2 = gate_up.shape
    ep = mesh.shape[EXPERT_AXIS]
    e_local = E // ep
    # gate_up is [E, H, 2I] fused: a model-axis shard must slice gate and
    # up halves together, which P on the last dim cannot express — keep the
    # FFN dim unsharded inside the body unless we split; psum over expert
    # only, model replicated.
    i_shard = None
    psum_axes = (EXPERT_AXIS,)
    if backend is None:
        backend = "ragged" if jax.devices()[0].platform == "tpu" else "dense"
    gus, ds = scales or (None, None)
    quant = gus is not None

    def body(xl, sc, ids, gu_l, dn_l, *scl):
        gus_l, ds_l = scl if quant else (None, None)
        ones = jnp.ones_like(sc)
        lids, wl, sel = _local_pairs(ids, ones, e_local)
        if backend == "dense":
            gu_l = _dq(gu_l, gus_l, xl.dtype)
            dn_l = _dq(dn_l, ds_l, xl.dtype)
        xin = xl[:, None, :] * sc[:, :, None].astype(xl.dtype)  # [N, k, H]
        xin = jnp.where(sel[:, :, None], xin, 0)
        if backend == "dense":
            xin = xin.astype(gu_l.dtype)
            # xin is already zeroed for non-local pairs; the one-hot picks
            # each pair's expert slot (combine weight is 1 for Llama-4).
            onehot = jax.nn.one_hot(lids, e_local, dtype=jnp.float32)
            gu = jnp.einsum("nkh,ehi->nkei", xin, gu_l)
            gate, up = jnp.split(gu, 2, axis=-1)
            act = jax.nn.silu(gate) * up
            out = jnp.einsum("nkei,eih->nkeh", act, dn_l)
            out = jnp.einsum("nkeh,nke->nh", out.astype(jnp.float32),
                             onehot)
        else:
            N, k = ids.shape
            xin = xin.astype(xl.dtype)
            flat_l = lids.reshape(-1)
            key = jnp.where(sel.reshape(-1), flat_l, e_local)
            order = jnp.argsort(key)
            inv_order = jnp.argsort(order)
            xs = xin.reshape(N * k, -1)[order]
            sid = jnp.clip(flat_l[order], 0, e_local - 1)
            group_sizes = jnp.bincount(
                jnp.where(sel.reshape(-1), flat_l, e_local),
                length=e_local).astype(jnp.int32)
            M = xs.shape[0]
            leftover = M - jnp.sum(group_sizes)
            group_sizes = group_sizes.at[-1].add(leftover)
            gu = _rdot(xs, gu_l, gus_l, sid, group_sizes)
            gate, up = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(gate) * up).astype(xs.dtype)
            out = _rdot(act, dn_l, ds_l, sid, group_sizes)
            out = out[inv_order].reshape(N, k, -1)
            out = jnp.einsum("nkh,nk->nh", out, wl.astype(jnp.float32))
        return jax.lax.psum(out, psum_axes)

    w_specs = (P(EXPERT_AXIS, None, i_shard),
               P(EXPERT_AXIS, i_shard, None))
    s_specs = (P(EXPERT_AXIS, None, None),
               P(EXPERT_AXIS, None, None)) if quant else ()
    f = jax.shard_map(
        body, mesh=mesh, axis_names={EXPERT_AXIS, MODEL_AXIS},
        in_specs=(P(), P(), P()) + w_specs + s_specs,
        out_specs=P(), check_vma=False)
    args = (x, scores, ids, gate_up, down)
    if quant:
        args = args + (gus, ds)
    return f(*args)
