# SPDX-License-Identifier: Apache-2.0
"""Paged block-KV attention ops.

TPU-native equivalents of the reference stack's NKI context-encoding and
token-generation kernels (reference: NxDI `attn_tkg_nki_kernel`,
`attn_block_tkg_nki_kernel` flags at
vllm_neuron/worker/neuronx_distributed_model_runner.py:805-811; block-KV layout
at worker/neuronx_distributed_model_loader.py:775-780).

KV cache layout per layer: ``[num_slots, num_kv_heads, head_dim]`` where
``num_slots = num_blocks * block_size`` — a flat slot space so scatter/gather
address tokens directly via ``slot = block_id * block_size + offset``. Slot 0
lives in the reserved null block (block 0): padded slot-mapping entries are -1
and dropped by the scatter (the TPU analogue of the reference's NKI "DMA skip"
pad, model_runner.py:805-811).

This module holds the JNP reference implementations (correct on CPU + TPU and
fully XLA-fusable). The Pallas kernels in ``ops/pallas/`` implement the same
signatures for the hot paths; callers select via ``use_pallas``.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PrefillMeta:
    """Metadata for a context-encoding (prefill) step.

    Shapes (static per bucket): B = prefill batch (usually 1), T = bucket len.
    """
    # Flat KV slot per token, [B*T] int32; -1 for pad tokens (scatter-dropped).
    slot_mapping: jax.Array
    # New tokens per row, [B] int32 (<= T).
    seq_lens: jax.Array
    # Prefix caching / chunked prefill: tokens already in the cache per row,
    # [B] int32. Zero when the prompt is fresh.
    cached_lens: jax.Array
    # Block table per row, [B, max_blocks_per_seq] int32. Only read when
    # cached_lens > 0 (prefix hit) — the fresh-prompt path attends to the
    # in-flight K/V directly.
    block_tables: jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DecodeMeta:
    """Metadata for a token-generation (decode) step. B = decode bucket."""
    # Flat KV slot for each new token, [B] int32; -1 for inactive rows.
    slot_mapping: jax.Array
    # [B, max_blocks_per_seq] int32.
    block_tables: jax.Array
    # Total context per row INCLUDING the token being generated, [B] int32.
    # 0 for inactive rows.
    context_lens: jax.Array


def write_kv(k_cache: jax.Array, v_cache: jax.Array, k: jax.Array,
             v: jax.Array, slot_mapping: jax.Array):
    """Scatter new K/V rows into the flat slot space.

    k_cache/v_cache: [num_slots, Hkv, D]; k/v: [N, Hkv, D];
    slot_mapping: [N] int32 with -1 = drop (out-of-bounds scatter is dropped).
    """
    k = k.astype(k_cache.dtype)
    v = v.astype(v_cache.dtype)
    k_cache = k_cache.at[slot_mapping].set(k, mode="drop",
                                           unique_indices=True)
    v_cache = v_cache.at[slot_mapping].set(v, mode="drop",
                                           unique_indices=True)
    return k_cache, v_cache


def _grouped_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: [B, T, Hq, D], k: [B, S, Hkv, D] -> scores [B, Hq, T, S] without
    materializing repeated KV heads (GQA via reshape-to-groups)."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    # [B, T, Hkv, G, D] x [B, S, Hkv, D] -> [B, Hkv, G, T, S]
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                        preferred_element_type=jnp.float32)
    return scores.reshape(B, Hq, T, k.shape[1])


def _grouped_out(probs: jax.Array, v: jax.Array) -> jax.Array:
    """probs: [B, Hq, T, S], v: [B, S, Hkv, D] -> [B, T, Hq, D]."""
    B, Hq, T, S = probs.shape
    Hkv = v.shape[2]
    G = Hq // Hkv
    pg = probs.reshape(B, Hkv, G, T, S)
    out = jnp.einsum("bkgts,bskd->btkgd", pg, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, v.shape[3])


_NEG_INF = float(jnp.finfo(jnp.float32).min)


def prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      seq_lens: jax.Array, scale: float,
                      sliding_window: Optional[int] = None) -> jax.Array:
    """Causal self-attention over a fresh (no cached prefix) prompt batch.

    q: [B, T, Hq, D]; k, v: [B, T, Hkv, D]; seq_lens: [B].
    Pad tokens (index >= seq_len) sit AFTER real tokens, so the causal mask
    already keeps them out of real tokens' attention windows.
    Returns [B, T, Hq, D] in q.dtype.
    """
    B, T = q.shape[:2]
    scores = _grouped_scores(q, k) * scale  # [B, Hq, T, S=T] f32
    i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    mask = (j <= i)[None, None]
    if sliding_window is not None:
        mask = mask & ((i - j) < sliding_window)[None, None]
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = _grouped_out(probs, v)
    return out.astype(q.dtype)


def prefix_prefill_attention(q: jax.Array, k_new: jax.Array,
                             v_new: jax.Array, k_cache: jax.Array,
                             v_cache: jax.Array, meta: PrefillMeta,
                             scale: float, block_size: int,
                             sliding_window: Optional[int] = None
                             ) -> jax.Array:
    """Prefill attention when rows may have a cached prefix (prefix-cache hit
    or a later chunk of a chunked prefill).

    Query token at local index i of row b has absolute position
    ``cached_lens[b] + i`` and may attend to cache slots [0, cached_lens[b])
    plus in-flight tokens [0, i]. The in-flight K/V have already been
    scattered into the cache by the caller, so we gather everything from the
    cache via the block table: key j (absolute) is visible to query i iff
    ``j < cached_lens[b] + i + 1``.

    q/k_new/v_new: [B, T, H*, D]; caches: [num_slots, Hkv, D].
    """
    B, T = q.shape[:2]
    S = meta.block_tables.shape[1] * block_size
    flat_slots = _block_tables_to_slots(meta.block_tables, block_size)  # [B,S]
    k_ctx = k_cache[flat_slots]  # [B, S, Hkv, D]
    v_ctx = v_cache[flat_slots]
    scores = _grouped_scores(q, k_ctx) * scale  # [B, Hq, T, S]
    i = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    limit = meta.cached_lens[:, None, None] + i[None] + 1  # [B, T, S]
    mask = j[None] < limit
    if sliding_window is not None:
        abs_pos = meta.cached_lens[:, None, None] + i[None]
        mask = mask & (j[None] > abs_pos - sliding_window)
    scores = jnp.where(mask[:, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = _grouped_out(probs, v_ctx)
    return out.astype(q.dtype)


def paged_decode_attention(q: jax.Array, k_cache: jax.Array,
                           v_cache: jax.Array, meta: DecodeMeta, scale: float,
                           block_size: int,
                           sliding_window: Optional[int] = None) -> jax.Array:
    """Token-generation attention: gather each row's context via its block
    table and attend. q: [B, T, Hq, D] (T = 1, or K for speculative steps);
    caches: [num_slots, Hkv, D]. Returns [B, T, Hq, D].

    The new tokens' K/V have already been scattered into the cache, so
    context_lens INCLUDES them.
    """
    B, T = q.shape[:2]
    S = meta.block_tables.shape[1] * block_size
    flat_slots = _block_tables_to_slots(meta.block_tables, block_size)
    k_ctx = k_cache[flat_slots]  # [B, S, Hkv, D]
    v_ctx = v_cache[flat_slots]
    scores = _grouped_scores(q, k_ctx) * scale  # [B, Hq, T, S]
    j = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    # Query local index i corresponds to absolute position
    # context_len - T + i; it sees keys j <= that position.
    limit = meta.context_lens[:, None, None] - T + i[None] + 1
    mask = j[None] < limit
    if sliding_window is not None:
        abs_pos = meta.context_lens[:, None, None] - T + i[None]
        mask = mask & (j[None] > abs_pos - sliding_window)
    scores = jnp.where(mask[:, None], scores, _NEG_INF)
    # Inactive rows (context_len == 0) have an all-masked row; make softmax
    # well-defined by unmasking key 0 for them (output is discarded anyway).
    all_masked = ~jnp.any(mask, axis=-1, keepdims=True)  # [B, T, 1]
    scores = jnp.where(all_masked[:, None], 0.0, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = _grouped_out(probs, v_ctx)
    return out.astype(q.dtype)


def _block_tables_to_slots(block_tables: jax.Array,
                           block_size: int) -> jax.Array:
    """[B, N] block ids -> [B, N*block_size] flat slot ids."""
    B, N = block_tables.shape
    offs = jax.lax.broadcasted_iota(jnp.int32, (N, block_size), 1)
    slots = block_tables[:, :, None] * block_size + offs[None]
    return slots.reshape(B, N * block_size)
