# SPDX-License-Identifier: Apache-2.0
"""Unified ragged paged attention — ONE attention op for every serving phase.

Prefill, decode, chunked prefill, prefix-cache hits, and (later) speculative
verification are all the same computation: a set of sequences, each
contributing q_len >= 1 new tokens whose K/V have just been scattered into the
paged KV cache, attending to its first kv_len cached tokens. This module is
the TPU-native equivalent of the reference stack's NKI context-encoding AND
token-generation kernels combined (reference flags
`attn_tkg_nki_kernel_enabled` / chunked-prefill CE kernel,
vllm_neuron/worker/neuronx_distributed_model_runner.py:805-811, :938-1051) —
where the reference needs two kernel families and a separate chunked path, the
ragged formulation needs one.

KV layout (per layer): ``[num_pages, page_size, 2 * num_kv_heads, head_dim]``
with K at even and V at odd combined-head indices — K/V for one page live in
one contiguous region, so a page moves HBM->VMEM in a single DMA.

Backends:
- "pallas": the tuned Mosaic kernel (TPU) — flash-style online softmax, only
  the first ceil(kv_len/page_size) pages of each sequence are ever read.
- "jnp":    a pure-XLA fallback (CPU tests / correctness oracle / platforms
  without Mosaic). Loops over sequences with static-shape masked attention.
"""
from __future__ import annotations

import functools
import threading
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RaggedMeta:
    """Metadata for one unified step.

    N = padded token bucket, S = max_num_seqs, P = pages_per_seq (static).
    """
    # Flat KV slot (page * page_size + offset) per token, [N] int32; -1 pad
    # (scatter-dropped into the reserved null page 0).
    slot_mapping: jax.Array
    # Post-step context length per sequence (cached + new), [S] int32.
    kv_lens: jax.Array
    # Page table per sequence, [S, P] int32 (null page 0 pads).
    page_indices: jax.Array
    # Cumulative new-token counts, [S+1] int32; cu_q_lens[num_seqs] = total.
    cu_q_lens: jax.Array
    # Actual number of sequences this step, [1] int32.
    num_seqs: jax.Array
    # Per-token LoRA adapter group id, [N] int32 (0 = base model); None when
    # the engine has no adapters registered (ops/lora.py). None is an empty
    # pytree, so LoRA-less programs are byte-identical to before.
    adapter_ids: Optional[jax.Array] = None


def padded_head_dim(head_dim: int) -> int:
    """The Mosaic kernel's lane width is 128: head dims below that are
    zero-padded into the KV page layout (q is padded symmetrically at the
    attention call, so scores/outputs are unchanged)."""
    return 128 if head_dim < 128 else head_dim


_FP8_MAX = 448.0  # e4m3fn finite max


#: Lane width of the scales tensor: one bf16 scale per SLOT, replicated
#: across a full 128-lane row. Measured on v5e (perf/fp8_scatter_ab.py,
#: 49184 pages): scattering [slots, 2Hkv]-minor-16 rows costs 4.62 ms/call
#: (TPU relayouts the partial-tile rows) vs 0.079 ms for full 128-lane
#: rows — the entire round-2 b48+fp8 bench collapse. Lane-replication
#: also lets the decode kernels dequantize with ONE sublane-broadcast
#: multiply instead of a per-head reshape dance.
SCALE_LANES = 128


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FP8KVCache:
    """FP8 paged KV storage WITH per-token (per-slot) scales.

    A raw e4m3 cast loses the magnitude spread across tokens (round 1
    measured a throughput+accuracy regression); the reference's FP8
    checkpoint convention also carries scales
    (test/utils/server/server.py:32-67). Here scales are DYNAMIC: each
    written token gets one scale absmax/448 over its K+V heads, stored
    lane-replicated beside the page ([..., page_size, SCALE_LANES]; see
    SCALE_LANES for why not per-head). Quantize fuses into the KV
    scatter, dequantize into the page gather / kernel DMA. Granularity is
    strictly finer than vLLM's per-tensor fp8 KV scale.

    Mirrors enough of the jax.Array surface (shape/dtype/reshape) that
    model forwards treat it exactly like the plain page array; the scales
    tensor always has shape == pages.shape[:-2] + (SCALE_LANES,).
    """
    pages: jax.Array    # [..., 2*Hkv, Dp]    float8_e4m3fn
    scales: jax.Array   # [..., SCALE_LANES]  bfloat16 (per-slot, replicated)

    @property
    def shape(self) -> tuple:
        return self.pages.shape

    @property
    def dtype(self):
        return self.pages.dtype

    def reshape(self, *shape) -> "FP8KVCache":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return FP8KVCache(self.pages.reshape(*shape),
                          self.scales.reshape(*shape[:-2], SCALE_LANES))

    def tree_flatten(self):
        return (self.pages, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def write_kv_pages(kv_pages_l: jax.Array, k: jax.Array, v: jax.Array,
                   slot_mapping: jax.Array) -> jax.Array:
    """Scatter new K/V into one layer's page cache.

    kv_pages_l: [num_pages, page_size, 2*Hkv, Dp]; k/v: [N, Hkv, D<=Dp];
    slot_mapping: [N] int32, -1 = drop. The TPU analogue of the reference's
    NKI slot-mapping DMA scatter with pad-skip (model_runner.py:805-811).

    JAX scatter wraps NEGATIVE indices NumPy-style even under mode="drop"
    (only truly out-of-bounds indices are dropped), so -1 pads must be
    remapped to indices >= num_slots before the scatter. Each pad gets a
    DISTINCT out-of-bounds index (num_slots + n) so unique_indices=True
    stays honest.
    """
    num_pages, page_size, two_hkv, Dp = kv_pages_l.shape
    D = k.shape[-1]
    N = k.shape[0]
    kv_new = jnp.stack([k, v], axis=2)  # [N, Hkv, 2, D]
    kv_new = kv_new.reshape(N, two_hkv, D)
    num_slots = num_pages * page_size
    oob = num_slots + jnp.arange(N, dtype=jnp.int32)
    slots = jnp.where(slot_mapping < 0, oob, slot_mapping)
    if isinstance(kv_pages_l, FP8KVCache):
        # Quantize fused into the scatter: ONE scale per written token
        # (max |K,V| across heads and dim), stored as a full 128-lane
        # replicated row — see SCALE_LANES for the measured reasons.
        absmax = jnp.max(jnp.abs(kv_new.astype(jnp.float32)),
                         axis=(-2, -1))                  # [N]
        scale = jnp.maximum(absmax / _FP8_MAX, 1e-8)
        q8 = (kv_new / scale[:, None, None]).astype(kv_pages_l.pages.dtype)
        if D < Dp:
            q8 = jnp.pad(q8, ((0, 0), (0, 0), (0, Dp - D)))
        pflat = kv_pages_l.pages.reshape(num_slots, two_hkv, Dp)
        sflat = kv_pages_l.scales.reshape(num_slots, SCALE_LANES)
        pflat = pflat.at[slots].set(q8, mode="drop", unique_indices=True)
        srows = jnp.broadcast_to(scale.astype(sflat.dtype)[:, None],
                                 (N, SCALE_LANES))
        sflat = sflat.at[slots].set(srows, mode="drop", unique_indices=True)
        return FP8KVCache(
            pflat.reshape(num_pages, page_size, two_hkv, Dp),
            sflat.reshape(num_pages, page_size, SCALE_LANES))
    kv_new = kv_new.astype(kv_pages_l.dtype)
    if D < Dp:
        kv_new = jnp.pad(kv_new, ((0, 0), (0, 0), (0, Dp - D)))
    flat = kv_pages_l.reshape(num_slots, two_hkv, Dp)
    flat = flat.at[slots].set(kv_new, mode="drop", unique_indices=True)
    return flat.reshape(num_pages, page_size, two_hkv, Dp)


# ---------------------------------------------------------------------------
# Dense page-gather backends (pure XLA — the production path for the two
# static step kinds the scheduler actually produces)
#
# Measured on v5e: page-granular XLA gather + dense attention runs at
# ~0.04 ms/layer for a 32-seq/512-ctx decode where the Mosaic ragged kernel
# has a flat ~1.2 ms/call overhead. Pages are large contiguous slices, so
# XLA's gather is a handful of wide DMAs, and the dense attention that
# follows fuses into a single memory-bound loop.
# ---------------------------------------------------------------------------


def _gather_ctx(kv_pages_l: jax.Array, page_indices: jax.Array
                ) -> tuple[jax.Array, jax.Array]:
    """Gather each row's context pages. page_indices: [B, PP] ->
    k, v: [B, PP*ps, Hkv, D] (f32-upcast deferred to the einsum)."""
    B, PP = page_indices.shape
    _, ps, two_hkv, D = kv_pages_l.shape
    if isinstance(kv_pages_l, FP8KVCache):
        ctx = kv_pages_l.pages[page_indices].astype(jnp.bfloat16)
        # Per-slot scale (lane-replicated storage; lane 0 suffices here).
        sc = kv_pages_l.scales[page_indices][..., :1].astype(jnp.bfloat16)
        ctx = ctx * sc[..., None]  # dequant fused into the gather
    else:
        ctx = kv_pages_l[page_indices]  # [B, PP, ps, 2Hkv, D]
        if jnp.dtype(ctx.dtype).itemsize == 1:  # scale-less fp8 (legacy)
            ctx = ctx.astype(jnp.bfloat16)
    ctx = ctx.reshape(B, PP * ps, two_hkv, D)
    return ctx[:, :, 0::2], ctx[:, :, 1::2]


def _dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     q_pos: jax.Array, kv_lens: jax.Array, sm_scale: float,
                     sliding_window: Optional[int],
                     chunk_size: Optional[int] = None) -> jax.Array:
    """Masked dense GQA attention.

    q: [B, T, Hq, D]; k/v: [B, C, Hkv, D]; q_pos: [B, T] absolute position
    of each query token (< 0 for pad rows); kv_lens: [B]. Key c is visible
    to query (b, t) iff c <= q_pos[b, t] and c < kv_lens[b].
    """
    B, T, Hq, D = q.shape
    C, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    scores = jnp.einsum("btkgd,bckd->bkgtc", qg, k,
                        preferred_element_type=jnp.float32) * sm_scale
    kv_pos = jnp.arange(C, dtype=jnp.int32)
    mask = kv_pos[None, None, :] <= q_pos[:, :, None]  # [B, T, C]
    mask &= kv_pos[None, None, :] < kv_lens[:, None, None]
    if sliding_window is not None:
        mask &= kv_pos[None, None, :] > q_pos[:, :, None] - sliding_window
    if chunk_size is not None:
        # Llama-4 local layers: attention confined to position chunks.
        mask &= (kv_pos[None, None, :] // chunk_size) == \
            (q_pos[:, :, None] // chunk_size)
    has_any = jnp.any(mask, axis=-1, keepdims=True)
    scores = jnp.where(mask[:, None, None], scores, _NEG_INF)
    scores = jnp.where(has_any[:, None, None], scores, 0.0)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgtc,bckd->btkgd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def _decode_attention_dense(q: jax.Array, kv_pages_l: jax.Array,
                            meta: RaggedMeta, sm_scale: float,
                            sliding_window: Optional[int],
                            chunk_size: Optional[int] = None) -> jax.Array:
    """Decode step: every row is one sequence contributing one token
    (N == S_step). kv_lens == 0 marks inactive pad rows."""
    N = q.shape[0]
    k, v = _gather_ctx(kv_pages_l, meta.page_indices)
    q_pos = (meta.kv_lens - 1)[:, None]  # [N, 1]; -1 for inactive rows
    out = _dense_attention(q[:, None], k, v, q_pos, meta.kv_lens, sm_scale,
                           sliding_window, chunk_size)
    return out[:, 0]


def _spec_verify_attention_dense(q: jax.Array, kv_pages_l: jax.Array,
                                 meta: RaggedMeta, sm_scale: float,
                                 sliding_window: Optional[int],
                                 chunk_size: Optional[int] = None
                                 ) -> jax.Array:
    """Speculative verification: every row is one sequence contributing
    exactly T = N_tokens / S_rows new tokens (the step token + K drafts),
    positions kv_len - T .. kv_len - 1."""
    B = meta.kv_lens.shape[0]
    T = q.shape[0] // B
    k, v = _gather_ctx(kv_pages_l, meta.page_indices)
    t = jnp.arange(T, dtype=jnp.int32)
    q_pos = meta.kv_lens[:, None] - T + t[None]  # negative for pad rows
    out = _dense_attention(q.reshape(B, T, *q.shape[1:]), k, v, q_pos,
                           meta.kv_lens, sm_scale, sliding_window,
                           chunk_size)
    return out.reshape(B * T, *q.shape[1:])


def _prefill_attention_dense(q: jax.Array, kv_pages_l: jax.Array,
                             meta: RaggedMeta, sm_scale: float,
                             sliding_window: Optional[int],
                             chunk_size: Optional[int] = None) -> jax.Array:
    """Context-encoding step: ONE sequence (reference policy: at most one
    prompt per prefill step, vllm_neuron/core/scheduler.py:116) whose
    q_len = cu_q_lens[1] new tokens sit at the end of kv_lens[0] total
    context (a cached prefix, if any, occupies the front)."""
    T = q.shape[0]
    kv_len = meta.kv_lens[0]
    q_len = meta.cu_q_lens[1]
    k, v = _gather_ctx(kv_pages_l, meta.page_indices[:1])
    t = jnp.arange(T, dtype=jnp.int32)
    q_pos = (kv_len - q_len + t)[None]  # pad tokens get pos >= kv_len; their
    # rows attend to the full prefix (harmless: outputs discarded).
    out = _dense_attention(q[None], k, v, q_pos, meta.kv_lens[:1], sm_scale,
                           sliding_window, chunk_size)
    return out[0]


def _prefill_batch_attention_dense(q: jax.Array, kv_pages_l: jax.Array,
                                   meta: RaggedMeta, sm_scale: float,
                                   sliding_window: Optional[int],
                                   chunk_size: Optional[int] = None
                                   ) -> jax.Array:
    """Grouped context encoding: S sequences at a FIXED stride T = N/S (each
    padded to the shared context bucket), so one program prefills a whole
    admission batch (the reference compiles one-prompt CE graphs and pays a
    dispatch per prompt; grouping amortizes the per-program cost). Sequence
    i's q_len comes from cu_q_lens diffs (a length carrier here, not packed
    offsets); its new tokens sit at the end of kv_lens[i] total context."""
    S = meta.kv_lens.shape[0]
    T = q.shape[0] // S
    k, v = _gather_ctx(kv_pages_l, meta.page_indices)  # [S, ctx, ...]
    t = jnp.arange(T, dtype=jnp.int32)
    q_lens = meta.cu_q_lens[1:] - meta.cu_q_lens[:-1]  # [S]
    q_pos = meta.kv_lens[:, None] - q_lens[:, None] + t[None]  # [S, T]
    out = _dense_attention(q.reshape(S, T, *q.shape[1:]), k, v, q_pos,
                           meta.kv_lens, sm_scale, sliding_window,
                           chunk_size)
    return out.reshape(S * T, *q.shape[1:])


# ---------------------------------------------------------------------------
# jnp fallback backend
# ---------------------------------------------------------------------------


def _ragged_attention_jnp(q: jax.Array, kv_pages_l: jax.Array,
                          meta: RaggedMeta, sm_scale: float,
                          sliding_window: Optional[int]) -> jax.Array:
    """Pure-XLA ragged attention. q: [N, Hq, D] -> [N, Hq, D].

    Iterates sequences with a fori_loop; each iteration runs all N query
    rows against that sequence's (static-size) gathered context and merges
    rows belonging to the sequence. O(S*N*ctx) FLOPs — fine as a fallback,
    the Pallas backend is the production path.
    """
    N, Hq, D = q.shape
    S = meta.kv_lens.shape[0]
    P = meta.page_indices.shape[1]
    page_size = kv_pages_l.shape[1]
    Hkv = kv_pages_l.shape[2] // 2
    G = Hq // Hkv
    ctx = P * page_size

    qf = q.astype(jnp.float32)
    token_idx = jnp.arange(N, dtype=jnp.int32)

    def body(i, out):
        pages = meta.page_indices[i]  # [P]
        if isinstance(kv_pages_l, FP8KVCache):
            kv_seq = (kv_pages_l.pages[pages].astype(jnp.float32) *
                      kv_pages_l.scales[pages][..., None].astype(
                          jnp.float32))
        else:
            kv_seq = kv_pages_l[pages]  # [P, ps, 2Hkv, D]
        kv_seq = kv_seq.reshape(ctx, 2 * Hkv, D)
        k_ctx = kv_seq[:, 0::2].astype(jnp.float32)  # [ctx, Hkv, D]
        v_ctx = kv_seq[:, 1::2].astype(jnp.float32)
        q_start = meta.cu_q_lens[i]
        q_end = meta.cu_q_lens[i + 1]
        kv_len = meta.kv_lens[i]
        q_len = q_end - q_start
        # scores via GQA grouping: [Hkv, G, N, ctx]
        qg = qf.reshape(N, Hkv, G, D)
        scores = jnp.einsum("nkgd,ckd->kgnc", qg, k_ctx,
                            preferred_element_type=jnp.float32) * sm_scale
        # Query token n (global) has in-seq index n - q_start and absolute
        # position kv_len - q_len + (n - q_start).
        q_pos = (kv_len - q_len + token_idx - q_start)  # [N]
        kv_pos = jnp.arange(ctx, dtype=jnp.int32)
        mask = kv_pos[None, :] <= q_pos[:, None]  # [N, ctx] causal
        if sliding_window is not None:
            mask &= kv_pos[None, :] > q_pos[:, None] - sliding_window
        mask &= (kv_pos < kv_len)[None, :]
        has_any = jnp.any(mask, axis=-1, keepdims=True)
        masked = jnp.where(mask[None, None], scores,
                           _NEG_INF)  # [Hkv, G, N, ctx]
        masked = jnp.where(has_any[None, None], masked, 0.0)
        probs = jax.nn.softmax(masked, axis=-1)
        o_i = jnp.einsum("kgnc,ckd->nkgd", probs, v_ctx,
                         preferred_element_type=jnp.float32)
        o_i = o_i.reshape(N, Hq, D)
        belongs = ((token_idx >= q_start) & (token_idx < q_end))[:, None,
                                                                 None]
        return jnp.where(belongs, o_i, out)

    out = jnp.zeros((N, Hq, D), jnp.float32)
    out = jax.lax.fori_loop(0, meta.num_seqs[0], body, out)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas backend (TPU)
# ---------------------------------------------------------------------------


def _ragged_attention_pallas(q: jax.Array, kv_pages_l: jax.Array,
                             meta: RaggedMeta, sm_scale: float,
                             sliding_window: Optional[int]) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention.kernel import (
        ragged_paged_attention)

    return ragged_paged_attention(
        q,
        kv_pages_l,
        meta.kv_lens,
        meta.page_indices,
        meta.cu_q_lens,
        meta.num_seqs,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        # The auto-tuned block sizes can overshoot the default 16 MiB scoped
        # VMEM budget at large q buckets; give the kernel the real budget.
        vmem_limit_bytes=100 * 1024 * 1024,
    )


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


@functools.cache
def _use_pallas_decode() -> bool:
    # A/B knob while the in-repo Pallas decode kernel
    # (ops/decode_attention.py) is validated against the dense XLA path on
    # real hardware. "dense" keeps round 1's page-bucket gather.
    import os
    return os.environ.get("VLLM_TPU_DECODE_ATTN", "pallas") != "dense"


@functools.cache
def _decode_kernel_fn():
    """Which in-repo Pallas decode kernel serves production. "fused" (flat
    stream + block-structured one-matmul GQA, see decode_attention.py)
    measured 797/785 tok/s e2e vs flat's 701/704 on the 8B INT8 b32 bench
    (decode-phase 1076/1083 vs 915/931) — the 16 tiny per-head dots were
    the decode step's bottleneck, not DMA. "flat" and "perrow" stay as A/B
    alternatives."""
    import os

    from vllm_neuron_tpu.ops import decode_attention as da
    variant = os.environ.get("VLLM_TPU_DECODE_KERNEL", "fused")
    # Chunk size (pages per serial kernel iteration): the flat stream is
    # per-iteration-latency bound, so bigger chunks = fewer iterations;
    # bounded by the 2-slot double-buffer fitting scoped VMEM. Default
    # "auto" picks the whole row when it fits (RTT-corrected A/B at B=32
    # kv=640: C2 0.420 ms/call -> C20 0.131, vs the 0.18 ms HBM floor —
    # round-3 PERF_NOTES).
    cpg_env = os.environ.get("VLLM_TPU_DECODE_CHUNK_PAGES", "auto")

    def auto_chunk(PP, slot_bytes):
        if cpg_env != "auto":
            return int(cpg_env)
        # Largest chunk whose 2-slot double-buffer stays within ~10 MB of
        # the 16 MB scoped-VMEM budget (headroom for q/out/score tiles),
        # hard-capped at 20: the kernel's fused-GQA matmul keeps a third
        # chunk-sized VMEM view, and C=40 (reachable when 2*Hkv is small,
        # e.g. GQA-8 at 4k-context page buckets) measured 17.3 MB scoped —
        # a compile-time VMEM OOM. C=20 is also the measured-fastest chunk
        # (round-3 in-program sweep: C20 0.594 ms vs C8 0.639).
        return max(1, min(PP, 20, (10 * 2**20) // (2 * slot_bytes)))
    if variant == "rowblock":
        # Whole rows per iteration + single-pass softmax; needs the
        # R-row double-buffer to fit scoped VMEM — falls back to the
        # fused flat stream per call site otherwise (long-context page
        # buckets).
        R = int(os.environ.get("VLLM_TPU_DECODE_ROWS", "2"))

        def rowblock_or_flat(q, kv_pages_l, lo, hi, page_indices, *,
                             num_kv_heads, sm_scale, interpret=False,
                             kv_scales=None):
            PP = page_indices.shape[1]
            _, ps, two_hkv, dp = kv_pages_l.shape
            if not da.rowblock_vmem_fits(R, PP, ps, two_hkv, dp,
                                         kv_pages_l.dtype.itemsize,
                                         has_scales=kv_scales is not None):
                # Scales ride a pre-gathered VMEM input, not the
                # per-chunk scratch; only KV bytes bound the chunk.
                slot_bytes = ps * two_hkv * dp * kv_pages_l.dtype.itemsize
                return da.decode_paged_attention_flat(
                    q, kv_pages_l, lo, hi, page_indices,
                    num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                    pages_per_chunk=auto_chunk(PP, slot_bytes),
                    fused_gqa=True, interpret=interpret,
                    kv_scales=kv_scales)
            return da.decode_paged_attention_rowblock(
                q, kv_pages_l, lo, hi, page_indices,
                num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                rows_per_block=R, interpret=interpret,
                kv_scales=kv_scales)

        return rowblock_or_flat

    def _no_scales(fn):
        def wrapped(*args, kv_scales=None, **kw):
            assert kv_scales is None, (
                "the per-row grid kernel does not read FP8 scales")
            return fn(*args, **kw)
        return wrapped

    if variant in ("fused", "flat"):
        def flat_auto(q, kv_pages_l, lo, hi, page_indices, *,
                      num_kv_heads, sm_scale, interpret=False,
                      kv_scales=None):
            PP = page_indices.shape[1]
            _, ps, two_hkv, dp = kv_pages_l.shape
            # Scales ride a pre-gathered VMEM input, not the
            # per-chunk scratch; only KV bytes bound the chunk.
            slot_bytes = ps * two_hkv * dp * kv_pages_l.dtype.itemsize
            return da.decode_paged_attention_flat(
                q, kv_pages_l, lo, hi, page_indices,
                num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                pages_per_chunk=auto_chunk(PP, slot_bytes),
                fused_gqa=(variant == "fused"), interpret=interpret,
                kv_scales=kv_scales)
        return flat_auto
    return _no_scales(da.decode_paged_attention)


# Mesh for partitioning the in-repo Pallas kernels (GSPMD cannot partition a
# custom call; the executor registers its mesh at trace time and the decode
# kernel runs under shard_map, heads split over the model axis). Thread-local:
# data-parallel engine lanes step concurrently from different threads, each
# with its own (sub-)mesh, and jit traces synchronously in the calling thread.
_ATTENTION_MESH_TLS = threading.local()


@functools.cache
def _flash_prefill_min_t() -> int:
    """Token-bucket threshold above which single-seq prefill takes the
    flash kernel. Measured per-layer on chip (perf/prefill_flash_ab.py,
    8B geometry, q_len=ctx): flash/dense 0.91/1.15 ms @1k, 0.86/1.99 @2k,
    2.97/8.53 @4k, 9.89/unrunnable @8k — flash wins from 1024 up, hence
    the default. Override: VLLM_TPU_PREFILL_FLASH_MIN_T (0 forces flash
    everywhere, huge disables)."""
    import os
    return int(os.environ.get("VLLM_TPU_PREFILL_FLASH_MIN_T", "1024"))


def set_attention_mesh(mesh) -> None:
    _ATTENTION_MESH_TLS.mesh = mesh


def get_attention_mesh():
    return getattr(_ATTENTION_MESH_TLS, "mesh", None)


def _pallas_decode_sharded(q, kv_pages_l, lo, hi, page_indices, *,
                           num_kv_heads: int, sm_scale: float,
                           interpret: bool = False, kv_scales=None):
    """Head-parallel decode kernel over the mesh: attention is embarrassingly
    parallel across KV-head groups, so each model-axis shard runs the kernel
    on its local heads — zero collectives. Requires the GQA group structure
    to split cleanly; the caller falls back to dense otherwise."""
    from jax.sharding import PartitionSpec as P

    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS

    mesh = get_attention_mesh()
    tp = mesh.shape[MODEL_AXIS]
    specs = [P(None, MODEL_AXIS, None),        # q [B, Hq, D]
             P(None, None, MODEL_AXIS, None),  # kv [pages, ps, 2Hkv, D]
             P(), P(), P()]                    # lo, hi, page_indices
    args = [q, kv_pages_l, lo, hi, page_indices]
    if kv_scales is not None:
        # Per-slot scales [pages, ps, SCALE_LANES]: no head axis, identical
        # on every shard -> replicated.
        specs.append(P(None, None, None))
        args.append(kv_scales)

    def body(q, kv, lo, hi, pi, *sc):
        return _decode_kernel_fn()(
            q, kv, lo, hi, pi, num_kv_heads=num_kv_heads // tp,
            sm_scale=sm_scale, interpret=interpret,
            kv_scales=sc[0] if sc else None)

    f = jax.shard_map(
        body, mesh=mesh, axis_names={MODEL_AXIS},
        in_specs=tuple(specs),
        out_specs=P(None, MODEL_AXIS, None),
        check_vma=False)
    return f(*args)


def _pallas_verify_sharded(q, kv_pages_l, lo, hi, page_indices, *,
                           num_kv_heads: int, sm_scale: float,
                           tokens_per_row: int, interpret: bool = False):
    """Head-parallel multi-token verify kernel over the mesh (same zero-
    collective head split as _pallas_decode_sharded)."""
    from jax.sharding import PartitionSpec as P

    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS
    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_verify)

    mesh = get_attention_mesh()
    tp = mesh.shape[MODEL_AXIS]

    def body(q, kv, lo, hi, pi):
        return decode_paged_attention_verify(
            q, kv, lo, hi, pi, num_kv_heads=num_kv_heads // tp,
            sm_scale=sm_scale, tokens_per_row=tokens_per_row,
            interpret=interpret)

    f = jax.shard_map(
        body, mesh=mesh, axis_names={MODEL_AXIS},
        in_specs=(P(None, MODEL_AXIS, None),
                  P(None, None, MODEL_AXIS, None), P(), P(), P()),
        out_specs=P(None, MODEL_AXIS, None),
        check_vma=False)
    return f(q, kv_pages_l, lo, hi, page_indices)


def _flash_prefill_sharded(q, k, v, q_start, kv_len, *, sm_scale: float,
                           interpret: bool = False):
    """Flash CE kernel under the mesh: like decode, prefill attention is
    embarrassingly parallel across KV-head groups, so each model-axis shard
    runs the kernel on its local heads — zero collectives."""
    from jax.sharding import PartitionSpec as P

    from vllm_neuron_tpu.ops.prefill_attention import flash_prefill
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS

    mesh = get_attention_mesh()

    def body(q, k, v, qs, kl):
        return flash_prefill(q, k, v, qs, kl, sm_scale=sm_scale,
                             interpret=interpret)

    f = jax.shard_map(
        body, mesh=mesh, axis_names={MODEL_AXIS},
        in_specs=(P(None, MODEL_AXIS, None), P(None, MODEL_AXIS, None),
                  P(None, MODEL_AXIS, None), P(), P()),
        out_specs=P(None, MODEL_AXIS, None),
        check_vma=False)
    return f(q, k, v, jnp.asarray(q_start, jnp.int32),
             jnp.asarray(kv_len, jnp.int32))


def _can_flash_shard(q, kv_pages_l) -> bool:
    """Head layout splits cleanly over the model axis (GQA groups intact on
    every shard)."""
    mesh = get_attention_mesh()
    if mesh is None:
        return True
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS
    tp = mesh.shape.get(MODEL_AXIS, 1)
    pages = kv_pages_l.pages if isinstance(kv_pages_l, FP8KVCache) \
        else kv_pages_l
    hkv = pages.shape[2] // 2
    return hkv % tp == 0 and q.shape[1] % tp == 0


def _scaled_kernel_eligible(pages, page_indices) -> bool:
    """Scaled-FP8 pages take the kernel path for the flat/fused variants
    (they DMA the scales page array alongside and dequantize in VMEM) and
    for rowblock, whose internal fallback is the scale-capable fused flat
    stream. Only the legacy per-row grid kernel cannot read scales."""
    import os

    return os.environ.get("VLLM_TPU_DECODE_KERNEL", "fused") in (
        "fused", "flat", "rowblock")


def _can_shard_decode(q, kv_pages_l) -> bool:
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS

    mesh = get_attention_mesh()
    if mesh is None:
        return True  # single device: plain kernel call
    tp = mesh.shape[MODEL_AXIS]
    if tp == 1:
        return True
    Hq = q.shape[1]
    Hkv = kv_pages_l.shape[2] // 2
    return Hq % tp == 0 and Hkv % tp == 0


@functools.cache
def _interpret_default() -> bool:
    """Run the in-repo Pallas kernels in interpret mode off-TPU (CPU
    dryruns / virtual meshes force backend='pallas' to trace the kernels'
    shard_map composition; Mosaic lowering needs real hardware)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


@functools.cache
def default_backend() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" else "jnp"


def ragged_attention(q: jax.Array, kv_pages_l: jax.Array, meta: RaggedMeta,
                     sm_scale: float,
                     sliding_window: Optional[int] = None,
                     kind: str = "mixed",
                     backend: Optional[str] = None,
                     chunk_size: Optional[int] = None) -> jax.Array:
    """q: [N, Hq, D]; kv_pages_l: [pages, page_size, 2*Hkv, Dp>=D] (already
    containing this step's scattered K/V). Returns [N, Hq, D] in q.dtype.

    ``kind`` is a static hint from the scheduler about the step's shape:
    - "decode":  every row is one sequence, one new token (N == S_step);
    - "prefill": one sequence, N-bucketed new tokens, optional cached prefix;
    - "mixed":   arbitrary ragged layout (chunked-prefill mixes, speculative
      verification) — Mosaic kernel on TPU, masked-loop XLA elsewhere.
    The dense page-gather paths are pure XLA and are the fastest on every
    backend measured (v5e + CPU), so "decode"/"prefill" use them everywhere.
    """
    backend = backend or default_backend()
    D = q.shape[-1]
    Dp = kv_pages_l.shape[-1]
    if D < Dp:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
    if kind == "decode":
        # FP8-with-scales pages run the in-repo kernels too: flat/fused
        # and rowblock DMA the scales page array alongside the pages and
        # dequantize in VMEM (HBM KV traffic stays fp8 + 1/Dp of scales).
        # Only the legacy per-row grid kernel falls to the dense path.
        pages = kv_pages_l.pages if isinstance(kv_pages_l,
                                               FP8KVCache) else kv_pages_l
        scales = (kv_pages_l.scales if isinstance(kv_pages_l, FP8KVCache)
                  else None)
        if (backend == "pallas" and _use_pallas_decode()
                and (scales is None or _scaled_kernel_eligible(
                    pages, meta.page_indices))
                and _can_shard_decode(q, pages)):
            from vllm_neuron_tpu.ops.decode_attention import visible_range
            lo, hi = visible_range(meta.kv_lens, sliding_window, chunk_size)
            num_kv_heads = pages.shape[2] // 2
            if get_attention_mesh() is not None:
                out = _pallas_decode_sharded(
                    q, pages, lo, hi, meta.page_indices,
                    num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                    kv_scales=scales, interpret=_interpret_default())
            else:
                out = _decode_kernel_fn()(
                    q, pages, lo, hi, meta.page_indices,
                    num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                    kv_scales=scales, interpret=_interpret_default())
        else:
            out = _decode_attention_dense(q, kv_pages_l, meta, sm_scale,
                                          sliding_window, chunk_size)
    elif kind == "prefill":
        if meta.kv_lens.shape[0] > 1:
            out = _prefill_batch_attention_dense(q, kv_pages_l, meta,
                                                 sm_scale, sliding_window,
                                                 chunk_size)
        elif (backend == "pallas" and sliding_window is None
              and chunk_size is None
              and q.shape[0] >= _flash_prefill_min_t()
              and _can_flash_shard(q, kv_pages_l)):
            # Long-context CE: the dense path materializes [T, C] scores
            # (~2 GB f32/head-group at T=C=4k on 8B); the flash kernel
            # streams kv tiles with an online-softmax carry instead
            # (reference analogue: the NKI CE kernel, kv tile 4096 —
            # SURVEY N2). Pages are XLA-gathered densely once (the same
            # traffic the dense path pays). Under a mesh it shard_maps
            # over the head axis (zero collectives).
            from vllm_neuron_tpu.ops.prefill_attention import flash_prefill
            k, v = _gather_ctx(kv_pages_l, meta.page_indices[:1])
            q_len = meta.cu_q_lens[1]
            if get_attention_mesh() is not None:
                out = _flash_prefill_sharded(
                    q, k[0], v[0], meta.kv_lens[0] - q_len,
                    meta.kv_lens[0], sm_scale=sm_scale,
                    interpret=_interpret_default())
            else:
                out = flash_prefill(q, k[0], v[0],
                                    meta.kv_lens[0] - q_len,
                                    meta.kv_lens[0], sm_scale=sm_scale,
                                    interpret=_interpret_default())
        else:
            out = _prefill_attention_dense(q, kv_pages_l, meta, sm_scale,
                                           sliding_window, chunk_size)
    elif kind == "spec_verify":
        # Multi-token paged verify kernel (round 5): the dense gather path
        # made one 8B fused spec ROUND cost ~204 ms at b64 (vs ~21 ms for
        # a plain decode step) — structurally unwinnable. The kernel
        # streams each row's pages ONCE (decode-priced HBM traffic) while
        # the fused-GQA matmul carries all T tokens. Sliding-window /
        # chunked-local layers and scaled-FP8 caches fall back to dense.
        B = meta.kv_lens.shape[0]
        T = q.shape[0] // B if B else 0
        if (backend == "pallas" and _use_pallas_decode()
                and not isinstance(kv_pages_l, FP8KVCache)
                and sliding_window is None and chunk_size is None
                and T >= 1 and T * B == q.shape[0]
                and _can_shard_decode(q, kv_pages_l)):
            from vllm_neuron_tpu.ops.decode_attention import (
                decode_paged_attention_verify)
            num_kv_heads = kv_pages_l.shape[2] // 2
            lo = jnp.zeros_like(meta.kv_lens)
            hi = meta.kv_lens
            if get_attention_mesh() is not None:
                out = _pallas_verify_sharded(
                    q, kv_pages_l, lo, hi, meta.page_indices,
                    num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                    tokens_per_row=T, interpret=_interpret_default())
            else:
                out = decode_paged_attention_verify(
                    q, kv_pages_l, lo, hi, meta.page_indices,
                    num_kv_heads=num_kv_heads, sm_scale=sm_scale,
                    tokens_per_row=T, interpret=_interpret_default())
        else:
            out = _spec_verify_attention_dense(q, kv_pages_l, meta,
                                               sm_scale, sliding_window,
                                               chunk_size)
    elif (backend == "pallas" and not isinstance(kv_pages_l, FP8KVCache)
          and get_attention_mesh() is None):
        out = _ragged_attention_pallas(q, kv_pages_l, meta, sm_scale,
                                       sliding_window)
    elif backend in ("jnp", "pallas"):
        # "pallas" lands here for FP8-with-scales mixed steps (the stock
        # Mosaic kernel cannot read the scales tensor) and for mixed steps
        # under a mesh (the stock kernel is not shard_map-wrapped; runtime
        # kinds are all dense/in-repo paths, so this is cold).
        out = _ragged_attention_jnp(q, kv_pages_l, meta, sm_scale,
                                    sliding_window)
    else:
        raise ValueError(f"unknown attention backend {backend!r}")
    return out[..., :D]
