# SPDX-License-Identifier: Apache-2.0
"""Pallas paged decode attention — fused page gather + flash softmax.

The production decode path in round 1 was a dense two-stage XLA program:
gather every row's page bucket into a [B, PP*ps, Hkv, D] transient, then run
masked dense attention over it. That costs 2x the live-context HBM traffic
(materialize + re-read), and reads the full page BUCKET per row regardless of
kv_len. This kernel is the TPU-native analogue of the reference's NKI
token-generation (TKG) kernel (vllm_neuron/worker/neuronx_distributed_model_
runner.py:805-811): one token per sequence, pages streamed HBM->VMEM with
double-buffered async DMA, online-softmax accumulation, and per-row kv_len
bounds so dead pages are never touched.

KV layout (shared with ops/ragged_attention.py): pages of
``[page_size, 2*Hkv, Dp]`` with K at even and V at odd combined-head indices
— one page is one contiguous DMA.

Visibility is expressed as a per-row [lo, hi) key range so one kernel serves
full causal decode (lo=0, hi=kv_len), sliding-window layers
(lo=max(0, kv_len-w)) and Llama-4 chunked local layers
(lo=((kv_len-1)//chunk)*chunk). Rows with hi == 0 are inactive pads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mask adder for invisible keys: large negative, but far from -inf so
# exp(x - m) never sees NaN (guide convention: -0.7 * float32 max).
_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    # scalar prefetch
    lo_ref, hi_ref, page_indices_ref,
    # inputs
    q_ref, kv_hbm_ref,
    # outputs
    o_ref,
    # scratch
    kv_buf, sem,
    *, page_size: int, pages_per_chunk: int, num_kv_heads: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    ps = page_size
    C = pages_per_chunk
    cs = C * ps  # keys per chunk
    hi = hi_ref[b]
    lo = lo_ref[b]

    Hq, Dp = q_ref.shape[1], q_ref.shape[2]
    Hkv = num_kv_heads
    G = Hq // Hkv

    # Page span [p0, p1) covering [lo, hi); chunks of C pages.
    p0 = lo // ps
    p1 = (hi + ps - 1) // ps
    n_chunks = (p1 - p0 + C - 1) // C

    def start_chunk_dma(ci, slot):
        # C page DMAs started concurrently; pages are non-contiguous.
        for j in range(C):
            pj = p0 + ci * C + j

            @pl.when(pj < p1)
            def _():
                page = page_indices_ref[b, pj]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page],
                    kv_buf.at[slot, j],
                    sem.at[slot, j],
                ).start()

    def wait_chunk(ci, slot):
        for j in range(C):
            pj = p0 + ci * C + j

            @pl.when(pj < p1)
            def _():
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0], kv_buf.at[slot, j], sem.at[slot, j],
                ).wait()

    @pl.when(hi > 0)
    def _active():
        start_chunk_dma(0, 0)

        # MXU consumes the cache dtype directly (f32 accumulation via
        # preferred_element_type); upcasting K/V to f32 first costs VPU
        # conversion passes plus f32 VMEM buffers and bought nothing.
        q = (q_ref[b].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
        qg = q.reshape(Hkv, G, Dp)

        def body(ci, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk_dma(ci + 1, 1 - slot)

            wait_chunk(ci, slot)
            # Combined-head index 2h is K_h, 2h+1 is V_h (h-major, k/v
            # minor). Mosaic's matmul wants plain 2D dots (batched
            # dot_general with mixed batch positions fails to lower), so
            # the GQA heads run as an unrolled loop of [G, Dp] x [cs, Dp]^T
            # matmuls — decode attention is DMA-bound, the tiny matmuls
            # ride along.
            kv = kv_buf[slot].reshape(cs, 2 * Hkv, Dp)

            base = (p0 + ci * C) * ps
            kpos = base + jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
            vis = (kpos >= lo) & (kpos < hi)              # [1, cs]
            # Column-oriented copy of the mask: Mosaic cannot transpose/
            # reshape an i1 vector ([1,cs]->[cs,1] fails to lower), so
            # build it from a column iota instead.
            kpos_col = base + jax.lax.broadcasted_iota(
                jnp.int32, (cs, 1), 0)
            vis_col = (kpos_col >= lo) & (kpos_col < hi)  # [cs, 1]

            s_heads = []
            for h in range(Hkv):
                s_h = jax.lax.dot_general(
                    qg[h], kv[:, 2 * h, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [G, cs]
                s_heads.append(s_h)
            s = jnp.stack(s_heads)                           # [Hkv, G, cs]
            # REPLACE (not add) masked scores, and zero masked V rows:
            # pages past p1 in the final chunk are never DMA'd, so their
            # buffer slots hold stale garbage (NaN in interpret mode) that
            # an additive mask cannot cancel.
            s = jnp.where(vis[None], s, _MASK)

            m_cur = jnp.max(s, axis=-1)                   # [Hkv, G]
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)              # [Hkv, G]
            p = jnp.exp(s - m_next[..., None])            # [Hkv, G, cs]
            l_next = alpha * l_prev + jnp.sum(p, axis=-1)
            p_lo = p.astype(kv_buf.dtype)
            o_heads = []
            for h in range(Hkv):
                # Zero stale-V rows (never-DMA'd buffer slots): their p is
                # exactly 0 via _MASK, but 0 * NaN would still poison the
                # matmul in interpret mode.
                v_h = jnp.where(vis_col, kv[:, 2 * h + 1, :],
                                jnp.zeros((), kv_buf.dtype))
                o_h = jax.lax.dot_general(
                    p_lo[h], v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [G, Dp]
                o_heads.append(o_h)
            o_cur = jnp.stack(o_heads)                    # [Hkv, G, Dp]
            acc = acc * alpha[..., None] + o_cur
            return m_next, l_next, acc

        m0 = jnp.full((Hkv, G), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((Hkv, G), jnp.float32)
        a0 = jnp.zeros((Hkv, G, Dp), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[b] = (acc * l_inv[..., None]).reshape(Hq, Dp).astype(
            o_ref.dtype)

    @pl.when(hi <= 0)
    def _inactive():
        o_ref[b] = jnp.zeros((Hq, Dp), o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_kv_heads", "sm_scale", "pages_per_chunk",
                     "interpret"))
def decode_paged_attention(q: jax.Array, kv_pages_l: jax.Array,
                           lo: jax.Array, hi: jax.Array,
                           page_indices: jax.Array, *,
                           num_kv_heads: int, sm_scale: float,
                           pages_per_chunk: int = 4,
                           interpret: bool = False) -> jax.Array:
    """q: [B, Hq, Dp]; kv_pages_l: [num_pages, ps, 2*Hkv, Dp];
    lo/hi: [B] int32 visible key range (hi == post-step kv_len; hi<=0 pads);
    page_indices: [B, PP]. Returns [B, Hq, Dp] in q.dtype.
    """
    B, Hq, Dp = q.shape
    _, ps, two_hkv, Dp2 = kv_pages_l.shape
    assert Dp == Dp2 and two_hkv == 2 * num_kv_heads
    C = pages_per_chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lo, hi, page_indices
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q (full)
            pl.BlockSpec(memory_space=pl.ANY),       # kv pages stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, ps, two_hkv, Dp), kv_pages_l.dtype),
            pltpu.SemaphoreType.DMA((2, C)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, page_size=ps, pages_per_chunk=C,
        num_kv_heads=num_kv_heads, sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lo, hi, page_indices, q, kv_pages_l)


def _flat_kernel(
    # scalar prefetch
    p0_ref, p1_ref, lo_ref, hi_ref, crow_ref, clocal_ref, contig_ref,
    total_ref, page_indices_ref,
    # inputs (+ s_hbm_ref when has_scales), outputs, scratch
    q_ref, kv_hbm_ref,
    *rest,
    page_size: int, pages_per_chunk: int, num_kv_heads: int,
    sm_scale: float, fused_gqa: bool = False, has_scales: bool = False,
    clamp_dma: bool = False,
):
    """Flat-stream variant: ONE grid instance walks the concatenated
    (row, chunk) stream of every sequence with a single globally
    double-buffered DMA pipeline — no per-row grid overhead, no DMA bubble
    at row boundaries (the next row's first chunk prefetches while the
    previous row finishes computing).

    fused_gqa: replace the 2*Hkv tiny per-head matmuls per chunk with ONE
    block-structured matmul per side. QK: q is expanded to [Hq, 2Hkv*Dp]
    with each row's values only in its kv-head's K slot (zeros elsewhere),
    so q_exp @ kv_flat.T yields exactly the block-diagonal grouped scores —
    cross-head terms vanish against the zero slots. PV: p @ kv_flat gives
    the full [Hq, 2Hkv*Dp] cross product in one op; each row's V slot is
    selected with a mask-and-sum. 16x the MXU FLOPs of the true
    computation, but the MXU is pipeline-fill-bound at these shapes, not
    FLOP-bound — step-ablation showed the 16-small-dots inner loop left
    decode attention ~4x over its HBM floor.

    has_scales: scaled-FP8 cache — a parallel scales page array rides its
    own DMA stream and the chunk is dequantized in VMEM right before the
    matmuls, so HBM KV traffic stays fp8 + scales. Scales are per-SLOT,
    lane-replicated [pages, ps, SCALE_LANES] (ragged_attention.py): page
    slices are full 128-lane rows (Mosaic DMA needs lane alignment) and
    the dequant is a lane-reduce + sublane-broadcast multiply."""
    if has_scales:
        # sc_ref: [B, NCH, cs] f32 VMEM INPUT — per-slot scales pre-gathered
        # by ONE XLA gather in the wrapper and pre-chunked to the kernel's
        # (row, chunk) layout. The previous design DMA'd a scales page
        # alongside every KV page: at b48/PP20 that is ~960 extra DMA
        # issues per call, measured as ~0.9 ms of the 4.2x fp8 overhead.
        sc_ref, o_ref, kv_buf, sem = rest
    else:
        o_ref, kv_buf, sem = rest
        sc_ref = None
    ps = page_size
    C = pages_per_chunk
    cs = C * ps
    Hq, Dp = q_ref.shape[1], q_ref.shape[2]
    Hkv = num_kv_heads
    G = Hq // Hkv
    T = total_ref[0]
    MAXC = crow_ref.shape[0]

    o_ref[:] = jnp.zeros_like(o_ref)  # inactive rows stay zero
    if fused_gqa:
        # The PV full-product multiplies p=0 against never-DMA'd buffer
        # slots; scratch VMEM can hold NaN bit patterns, and 0*NaN=NaN.
        # One zero-fill per launch makes every stale slot finite.
        kv_buf[...] = jnp.zeros(kv_buf.shape, kv_buf.dtype)
    if has_scales and not fused_gqa:
        kv_buf[...] = jnp.zeros(kv_buf.shape, kv_buf.dtype)
    if fused_gqa:
        # Row i's K slot is 2*(i//G), its V slot 2*(i//G)+1. Built directly
        # in 3-D: Mosaic can't add a minor dim to an i1 vector via reshape
        # ("insertion of minor dim ... only supported for 32-bit types").
        rowslot = (jax.lax.broadcasted_iota(
            jnp.int32, (Hq, 2 * Hkv, 1), 0) // G) * 2
        slotid = jax.lax.broadcasted_iota(jnp.int32, (Hq, 2 * Hkv, 1), 1)
        mask_k = slotid == rowslot                        # [Hq, 2Hkv, 1]
        mask_v = slotid == rowslot + 1

    PP = page_indices_ref.shape[1]

    # Contiguous-run fast path: when a chunk's pages are CONSECUTIVE pool
    # indices (the common case — the allocator hands out a prefill's
    # blocks in one sequential allocate()), the whole chunk is ONE
    # C-page DMA instead of C per-page copies. The round-3 C-sweep showed
    # per-iteration cost ~0.9 µs per DMA ISSUE (C4 4.1 µs/iter -> C20
    # 18.6 µs/iter at near-constant bytes), i.e. the kernel was
    # issue-bound, not bandwidth-bound; one big copy also streams at the
    # sequential HBM rate (~740 GB/s) instead of the scattered-page rate
    # (~460). contig_ref[t] holds the first POOL page index of chunk t
    # when the run is contiguous (and start+C stays in bounds), else -1.
    if clamp_dma:
        # Unconditional C copies per chunk with the page index CLAMPED into
        # range for the tail: the per-iteration cost is dominated by the
        # 2*C predicated DMA issues/waits (scalar branches around every
        # page), not the bytes — tail chunks re-copy one in-range page a
        # few extra times and the visibility mask zeroes its scores. This
        # also guarantees every buffer slot is freshly written (no stale
        # NaN concern).
        def start_chunk_dma(t, slot):
            r = crow_ref[t]
            pstart = p0_ref[r] + clocal_ref[t] * C
            for j in range(C):
                page = page_indices_ref[
                    r, jnp.minimum(pstart + j, PP - 1)]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page],
                    kv_buf.at[slot, j],
                    sem.at[slot, j],
                ).start()

        def wait_chunk(t, slot):
            for j in range(C):
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0], kv_buf.at[slot, j], sem.at[slot, j],
                ).wait()
    else:
        start_chunk_dma, wait_chunk = _chunk_dma_fns(
            contig_ref, crow_ref, clocal_ref, p0_ref, p1_ref,
            page_indices_ref, kv_hbm_ref, kv_buf, sem, C, PP)

    @pl.when(T > 0)
    def _():
        start_chunk_dma(0, 0)

    def body(t, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < T)
        def _():
            start_chunk_dma(t + 1, 1 - slot)

        wait_chunk(t, slot)
        r = crow_ref[t]
        cl = clocal_ref[t]
        lo = lo_ref[r]
        hi = hi_ref[r]
        first = cl == 0
        m_prev = jnp.where(first, jnp.full_like(m_prev, -jnp.inf), m_prev)
        l_prev = jnp.where(first, jnp.zeros_like(l_prev), l_prev)
        acc = jnp.where(first, jnp.zeros_like(acc), acc)

        # MXU consumes the cache dtype directly (f32 accumulation via
        # preferred_element_type); upcasting K/V to f32 first costs VPU
        # conversion passes plus f32 VMEM buffers and bought nothing.
        q = (q_ref[r].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
        if has_scales:
            # Scaled FP8: NO dequant pass. Scores fold the per-slot scale
            # per COLUMN (s_true = (q . k8) * sc) and the PV side folds it
            # into p (sum p . v8 . sc == sum (p*sc) . v8) — both are
            # natural [1, cs] lane broadcasts from the pre-gathered VMEM
            # scales, so the only per-chunk cost over bf16 is the fp8->
            # dtype conversion for dot-operand uniformity.
            sc = sc_ref[r, cl].reshape(1, cs).astype(jnp.float32)
            # No conversion pass either: fp8->bf16 is a cross-sublane
            # relayout of the whole chunk (measured ~0.8 ms/call at b48 —
            # the dominant fp8 overhead). The MXU consumes the fp8 operand
            # directly against bf16 q / p (f32 accumulate).
            kv = kv_buf[slot].reshape(cs, 2 * Hkv, Dp)
        else:
            sc = None
            kv = kv_buf[slot].reshape(cs, 2 * Hkv, Dp)

        base = (p0_ref[r] + cl * C) * ps
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
        vis = (kpos >= lo) & (kpos < hi)                  # [1, cs]

        if fused_gqa:
            q_exp = (q[:, None, :] *
                     mask_k.astype(q.dtype)).reshape(Hq, 2 * Hkv * Dp)
            kvf = (kv.reshape(cs, 2 * Hkv * Dp) if has_scales
                   else kv_buf[slot].reshape(cs, 2 * Hkv * Dp))
            s = jax.lax.dot_general(
                q_exp, kvf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [Hq, cs]
            if has_scales:
                s = s * sc                                # K-side dequant
            s = jnp.where(vis, s, _MASK).reshape(Hkv, G, cs)
        else:
            qg = q.reshape(Hkv, G, Dp)
            s_heads = []
            for h in range(Hkv):
                s_h = jax.lax.dot_general(
                    qg[h], kv[:, 2 * h, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [G, cs]
                if has_scales:
                    s_h = s_h * sc                        # K-side dequant
                s_heads.append(s_h)
            s = jnp.stack(s_heads)                        # [Hkv, G, cs]
            s = jnp.where(vis[None], s, _MASK)

        m_cur = jnp.max(s, axis=-1)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[..., None])
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)
        if has_scales:
            p = p * (sc if fused_gqa else sc[None])       # V-side dequant
            p_lo = p.astype(jnp.bfloat16)  # mixed bf16 x fp8 PV dot
        else:
            p_lo = p.astype(kv.dtype)
        if fused_gqa:
            # Invisible positions have p exactly 0 (exp(_MASK - m) == 0),
            # and the launch-time zero-fill keeps stale slots finite, so no
            # V-side masking is needed.
            o16 = jax.lax.dot_general(
                p_lo.reshape(Hq, cs), kvf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [Hq, 2Hkv*Dp]
            o = jnp.sum(o16.reshape(Hq, 2 * Hkv, Dp) * mask_v, axis=1)
            acc = acc * alpha[..., None] + o.reshape(Hkv, G, Dp)
        else:
            kpos_col = base + jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0)
            vis_col = (kpos_col >= lo) & (kpos_col < hi)  # [cs, 1]
            o_heads = []
            for h in range(Hkv):
                v_h = jnp.where(vis_col, kv[:, 2 * h + 1, :],
                                jnp.zeros((), kv.dtype))
                o_h = jax.lax.dot_general(
                    p_lo[h], v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [G, Dp]
                o_heads.append(o_h)
            acc = acc * alpha[..., None] + jnp.stack(o_heads)

        # Flush at the last chunk of this row.
        t_nxt = jnp.minimum(t + 1, MAXC - 1)
        is_last = jnp.logical_or(t + 1 >= T, crow_ref[t_nxt] != r)

        @pl.when(is_last)
        def _():
            l_inv = jnp.where(l_next == 0.0, 0.0, 1.0 / l_next)
            o_ref[r] = (acc * l_inv[..., None]).reshape(Hq, Dp).astype(
                o_ref.dtype)

        return m_next, l_next, acc

    m0 = jnp.full((Hkv, G), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((Hkv, G), jnp.float32)
    a0 = jnp.zeros((Hkv, G, Dp), jnp.float32)
    jax.lax.fori_loop(0, T, body, (m0, l0, a0))


@functools.cache
def _contig_dma_default() -> bool:
    # VLLM_TPU_DECODE_CONTIG=0 disables the contiguous-run chunk DMA fast
    # path (one C-page copy per chunk when the pool pages are consecutive)
    # for A/B runs; same compiled program, the table is just all -1.
    import os
    return os.environ.get("VLLM_TPU_DECODE_CONTIG", "1") != "0"




def _chunk_dma_fns(contig_ref, crow_ref, clocal_ref, p0_ref, p1_ref,
                   page_indices_ref, kv_hbm_ref, kv_buf, sem, C: int,
                   PP: int):
    """Shared chunk DMA start/wait builders (flat + verify kernels): one
    C-page copy when the chunk's pool pages are consecutive (contig_ref),
    per-page predicated copies otherwise."""
    def start_chunk_dma(t, slot):
        cg = contig_ref[t]

        @pl.when(cg >= 0)
        def _():
            pltpu.make_async_copy(
                kv_hbm_ref.at[pl.ds(cg, C)], kv_buf.at[slot],
                sem.at[slot, 0],
            ).start()

        @pl.when(cg < 0)
        def _():
            r = crow_ref[t]
            pstart = p0_ref[r] + clocal_ref[t] * C
            for j in range(C):
                @pl.when(pstart + j < p1_ref[r])
                def _():
                    page = page_indices_ref[r, pstart + j]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page], kv_buf.at[slot, j],
                        sem.at[slot, j],
                    ).start()

    def wait_chunk(t, slot):
        cg = contig_ref[t]

        @pl.when(cg >= 0)
        def _():
            pltpu.make_async_copy(
                kv_hbm_ref.at[pl.ds(0, C)], kv_buf.at[slot],
                sem.at[slot, 0],
            ).wait()

        @pl.when(cg < 0)
        def _():
            r = crow_ref[t]
            pstart = p0_ref[r] + clocal_ref[t] * C
            for j in range(C):
                @pl.when(pstart + j < p1_ref[r])
                def _():
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0], kv_buf.at[slot, j],
                        sem.at[slot, j],
                    ).wait()

    return start_chunk_dma, wait_chunk


def _chunk_tables(p0, p1, page_indices, num_pages: int, C: int):
    """Host-graph chunk stream tables for the flat/verify kernels:
    (crow, clocal, contig, total) for per-row visible page ranges
    [p0, p1) (inactive rows: p0 == p1 == 0). contig[t] = first pool page
    of chunk t when its valid pages are consecutive AND a full C-page
    slice stays in bounds (tail over-reads are masked by visibility),
    else -1 (per-page DMA fallback). VLLM_TPU_DECODE_CONTIG=0 forces -1
    for A/B runs.
    """
    B, PP = page_indices.shape
    max_cpr = (PP + C - 1) // C
    MAXC = B * max_cpr
    nc = (p1 - p0 + C - 1) // C
    cu = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.cumsum(nc, dtype=jnp.int32)])
    total = cu[-1:]
    t = jnp.arange(MAXC, dtype=jnp.int32)
    crow = jnp.sum((t[:, None] >= cu[None, 1:]).astype(jnp.int32), axis=1)
    crow = jnp.minimum(crow, B - 1).astype(jnp.int32)
    clocal = (t - cu[crow]).astype(jnp.int32)
    nxt = (page_indices[:, 1:] == page_indices[:, :-1] + 1)
    csum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.cumsum(nxt.astype(jnp.int32), axis=1)], axis=1)
    pstart = p0[crow] + clocal * C
    nvalid = jnp.clip(p1[crow] - pstart, 0, C)
    last = jnp.clip(pstart + nvalid - 1, 0, PP - 1)
    first = jnp.clip(pstart, 0, PP - 1)
    run_ok = (csum[crow, last] - csum[crow, first]) == (nvalid - 1)
    start_pg = page_indices[crow, first]
    contig_ok = (run_ok & (nvalid >= 1) & (start_pg >= 0)
                 & (start_pg + C <= num_pages))
    contig = jnp.where(contig_ok, start_pg, -1).astype(jnp.int32)
    if not _contig_dma_default():
        contig = jnp.full_like(contig, -1)  # A/B: force per-page DMAs
    return crow, clocal, contig, total


@functools.cache
def _clamp_dma_default() -> bool:
    # Unconditional clamped-index chunk DMAs (see _flat_kernel). Measured
    # on chip (fused C20, B=64 kv=576, AB_SCAN=8): 0.292 ms/call vs the
    # predicated issues' 0.279 — the per-page @pl.when branches are NOT
    # the per-iteration cost, so predicated stays the default. The same
    # session showed fusedC20 at 0.279 ms/call is within ~15% of the
    # 64-row HBM read floor — decode attention is essentially at
    # speed-of-light; remaining step time is the weight stream.
    import os
    return os.environ.get("VLLM_TPU_DECODE_DMA", "when") == "clamp"


@functools.partial(
    jax.jit,
    static_argnames=("num_kv_heads", "sm_scale", "pages_per_chunk",
                     "interpret", "fused_gqa", "clamp_dma"))
def decode_paged_attention_flat(q: jax.Array, kv_pages_l: jax.Array,
                                lo: jax.Array, hi: jax.Array,
                                page_indices: jax.Array, *,
                                num_kv_heads: int, sm_scale: float,
                                pages_per_chunk: int = 4,
                                fused_gqa: bool = False,
                                interpret: bool = False,
                                kv_scales: jax.Array = None,
                                clamp_dma: bool = None) -> jax.Array:
    """Flat-stream decode attention (see _flat_kernel). Same contract as
    decode_paged_attention. kv_scales: optional [pages, ps, SCALE_LANES]
    per-slot lane-replicated dequant scales (scaled-FP8 cache)."""
    B, Hq, Dp = q.shape
    _, ps, two_hkv, Dp2 = kv_pages_l.shape
    assert Dp == Dp2 and two_hkv == 2 * num_kv_heads
    PP = page_indices.shape[1]
    C = min(pages_per_chunk, PP)
    max_cpr = (PP + C - 1) // C
    MAXC = B * max_cpr
    has_scales = kv_scales is not None

    # Chunk + contiguous-run tables, computed in-graph (tiny XLA ops on
    # [B]-sized arrays; shared with the verify kernel).
    active = hi > 0
    p0 = jnp.where(active, lo // ps, 0).astype(jnp.int32)
    p1 = jnp.where(active, (hi + ps - 1) // ps, 0).astype(jnp.int32)
    crow, clocal, contig, total = _chunk_tables(
        p0, p1, page_indices, kv_pages_l.shape[0], C)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # q (full)
        pl.BlockSpec(memory_space=pl.ANY),       # kv pages stay in HBM
    ]
    scratch = [pltpu.VMEM((2, C, ps, two_hkv, Dp), kv_pages_l.dtype)]
    if has_scales:
        # Per-slot lane-replicated scales [pages, ps, SCALE_LANES]
        # (ragged_attention.py). ONE XLA gather + chunk-reshape feeds the
        # kernel a small [B, NCH, cs] f32 VMEM input — per-page scale
        # DMAs cost ~0.9 ms/call at b48 (960 extra DMA issues).
        assert kv_scales.shape == (kv_pages_l.shape[0], ps,
                                   kv_scales.shape[-1]), kv_scales.shape
        # Gather FIRST, slice lane 0 after: slicing the full scales
        # array first materializes a pass over ALL pages (~0.9 ms/layer
        # at 49k pages); the gather touches only the indexed pages.
        sc = kv_scales[page_indices][..., 0].astype(jnp.float32)
        pad_pp = max_cpr * C - PP
        if pad_pp:
            sc = jnp.pad(sc, ((0, 0), (0, pad_pp), (0, 0)))
        kv_scales = sc.reshape(B, max_cpr, C * ps)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch.append(pltpu.SemaphoreType.DMA((2, C)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    if clamp_dma is None:
        clamp_dma = _clamp_dma_default()
    kernel = functools.partial(
        _flat_kernel, page_size=ps, pages_per_chunk=C,
        num_kv_heads=num_kv_heads, sm_scale=sm_scale, fused_gqa=fused_gqa,
        has_scales=has_scales, clamp_dma=clamp_dma)
    args = (p0, p1, lo.astype(jnp.int32), hi.astype(jnp.int32), crow,
            clocal, contig, total, page_indices, q, kv_pages_l)
    if has_scales:
        args = args + (kv_scales,)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)


def _rowblock_kernel(
    # scalar prefetch
    p0_ref, p1_ref, lo_ref, hi_ref, nblocks_ref, page_indices_ref,
    # inputs (+ s_hbm_ref when has_scales), outputs, scratch
    q_ref, kv_hbm_ref,
    *rest,
    page_size: int, rows_per_block: int, num_kv_heads: int,
    sm_scale: float, has_scales: bool = False,
):
    """Row-block single-pass variant: each serial iteration processes R
    WHOLE rows — their full visible page range DMA'd into one buffer slot,
    one fused block-structured QK matmul, one un-chunked softmax (no flash
    running-max carry at all), one PV matmul. Cross-row and invisible
    score entries are masked to exactly zero probability, so the full
    [R*Hq, R*cs] product is block-diagonal by construction.

    Rationale: the flat-stream kernel is per-iteration-latency bound
    (~µs of fixed cost per chunk vs ~0.16 µs of HBM time per page).
    ceil(B/R) iterations is the floor for a serial TPU core; with the
    whole row resident the kernel's HBM traffic (the entire visible KV
    once) becomes the dominant term — the speed-of-light for decode
    attention. VMEM bounds R * PP (wrapper falls back to the flat kernel
    when the double-buffer would not fit scoped VMEM)."""
    if has_scales:
        # sc_ref: [B, cs] f32 VMEM INPUT — per-slot scales pre-gathered by
        # ONE XLA gather in the wrapper (whole visible rows, matching this
        # kernel's whole-row iteration). See _flat_kernel for why scales
        # never ride their own DMA stream.
        sc_ref, o_ref, kv_buf, sem = rest
    else:
        o_ref, kv_buf, sem = rest
        sc_ref = None
    ps = page_size
    R = rows_per_block
    P = page_indices_ref.shape[1]
    cs = P * ps
    B, Hq, Dp = q_ref.shape
    Hkv = num_kv_heads
    G = Hq // Hkv
    NB = nblocks_ref[0]

    o_ref[:] = jnp.zeros_like(o_ref)  # inactive rows stay zero
    # Stale buffer slots can hold NaN bit patterns; 0 * NaN = NaN in the
    # PV full product. One zero-fill per launch keeps every slot finite.
    kv_buf[...] = jnp.zeros(kv_buf.shape, kv_buf.dtype)

    # Head-slot masks (fused-GQA trick): q row m (= block k*Hq + h) has its
    # K slot at 2*(h//G), its V slot at 2*(h//G)+1.
    rowslot = ((jax.lax.broadcasted_iota(
        jnp.int32, (R * Hq, 2 * Hkv, 1), 0) % Hq) // G) * 2
    slotid = jax.lax.broadcasted_iota(jnp.int32, (R * Hq, 2 * Hkv, 1), 1)
    mask_k = slotid == rowslot                            # [R*Hq, 2Hkv, 1]
    mask_v = slotid == rowslot + 1

    # Block-diagonal (same-row) mask over the full score grid.
    qblk = jax.lax.broadcasted_iota(
        jnp.int32, (R * Hq, R * cs), 0) // Hq
    kblk = jax.lax.broadcasted_iota(
        jnp.int32, (R * Hq, R * cs), 1) // cs
    same_row = qblk == kblk

    def start_rows_dma(t, slot):
        r0 = t * R
        for k in range(R):
            r = jnp.minimum(r0 + k, B - 1)
            npg = p1_ref[r] - p0_ref[r]
            for j in range(P):
                @pl.when(jnp.logical_and(r0 + k < B, j < npg))
                def _():
                    page = page_indices_ref[r, p0_ref[r] + j]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page],
                        kv_buf.at[slot, k, j],
                        sem.at[slot, k, j],
                    ).start()

    def wait_rows(t, slot):
        r0 = t * R
        for k in range(R):
            r = jnp.minimum(r0 + k, B - 1)
            npg = p1_ref[r] - p0_ref[r]
            for j in range(P):
                @pl.when(jnp.logical_and(r0 + k < B, j < npg))
                def _():
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0], kv_buf.at[slot, k, j],
                        sem.at[slot, k, j],
                    ).wait()

    @pl.when(NB > 0)
    def _():
        start_rows_dma(0, 0)

    def body(t, carry):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < NB)
        def _():
            start_rows_dma(t + 1, 1 - slot)

        wait_rows(t, slot)
        r0 = t * R

        # q_exp: R rows' queries expanded into their K slots.
        q_rows = []
        vis_rows = []
        sc_rows = []
        for k in range(R):
            r = jnp.minimum(r0 + k, B - 1)
            qk = (q_ref[r].astype(jnp.float32) * sm_scale).astype(
                q_ref.dtype)                               # [Hq, Dp]
            q_rows.append(qk)
            kpos = p0_ref[r] * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, cs), 1)
            visk = (kpos >= lo_ref[r]) & (kpos < hi_ref[r])
            visk = jnp.logical_and(visk, r0 + k < B)
            vis_rows.append(visk)
            if has_scales:
                sc_rows.append(sc_ref[r].reshape(1, cs))
        q_all = jnp.concatenate(q_rows, axis=0)           # [R*Hq, Dp]
        vis = jnp.concatenate(vis_rows, axis=1)           # [1, R*cs]
        q_exp = (q_all[:, None, :] *
                 mask_k.astype(q_all.dtype)).reshape(R * Hq, 2 * Hkv * Dp)

        if has_scales:
            # Scaled FP8: no conversion, no dequant pass; the per-slot
            # scale folds into the scores (K side) and into p (V side) as
            # [1, R*cs] lane broadcasts, and the MXU consumes fp8 directly
            # (see _flat_kernel).
            sc = jnp.concatenate(sc_rows, axis=1)         # [1, R*cs]
            kvf = kv_buf[slot].reshape(R * cs, 2 * Hkv * Dp)
        else:
            sc = None
            kvf = kv_buf[slot].reshape(R * cs, 2 * Hkv * Dp)
        s = jax.lax.dot_general(
            q_exp, kvf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [R*Hq, R*cs]
        if has_scales:
            s = s * sc                                    # K-side dequant
        s = jnp.where(jnp.logical_and(same_row, vis), s, _MASK)

        # Single-pass softmax: the whole row is resident, no carry.
        m = jnp.max(s, axis=-1, keepdims=True)            # [R*Hq, 1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if has_scales:
            p = p * sc                                    # V-side dequant
            p_lo = p.astype(jnp.bfloat16)  # mixed bf16 x fp8 PV dot
        else:
            p_lo = p.astype(kvf.dtype)
        o16 = jax.lax.dot_general(
            p_lo, kvf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [R*Hq, 2Hkv*Dp]
        o = jnp.sum(o16.reshape(R * Hq, 2 * Hkv, Dp) * mask_v, axis=1)
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o = (o * l_inv).astype(o_ref.dtype)               # [R*Hq, Dp]

        for k in range(R):
            @pl.when(jnp.logical_and(r0 + k < B,
                                     hi_ref[jnp.minimum(r0 + k, B - 1)] > 0))
            def _():
                o_ref[r0 + k] = o[k * Hq:(k + 1) * Hq]

        return carry

    jax.lax.fori_loop(0, NB, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_kv_heads", "sm_scale", "rows_per_block",
                     "interpret"))
def decode_paged_attention_rowblock(q: jax.Array, kv_pages_l: jax.Array,
                                    lo: jax.Array, hi: jax.Array,
                                    page_indices: jax.Array, *,
                                    num_kv_heads: int, sm_scale: float,
                                    rows_per_block: int = 2,
                                    interpret: bool = False,
                                    kv_scales: jax.Array = None
                                    ) -> jax.Array:
    """Row-block decode attention (see _rowblock_kernel). Same contract as
    decode_paged_attention. kv_scales: optional [pages, ps, SCALE_LANES]
    per-slot lane-replicated dequant scales (FP8 cache) — DMA'd alongside
    the pages."""
    B, Hq, Dp = q.shape
    _, ps, two_hkv, Dp2 = kv_pages_l.shape
    assert Dp == Dp2 and two_hkv == 2 * num_kv_heads
    PP = page_indices.shape[1]
    R = min(rows_per_block, B)
    has_scales = kv_scales is not None

    active = hi > 0
    p0 = jnp.where(active, lo // ps, 0).astype(jnp.int32)
    p1 = jnp.where(active, (hi + ps - 1) // ps, 0).astype(jnp.int32)
    nblocks = jnp.full((1,), (B + R - 1) // R, jnp.int32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # q (full)
        pl.BlockSpec(memory_space=pl.ANY),       # kv pages stay in HBM
    ]
    scratch = [
        pltpu.VMEM((2, R, PP, ps, two_hkv, Dp), kv_pages_l.dtype),
    ]
    if has_scales:
        # Per-slot lane-replicated layout; ONE XLA gather feeds the kernel
        # a [B, PP*ps] f32 VMEM input of whole visible rows (see
        # decode_paged_attention_flat).
        assert kv_scales.shape == (kv_pages_l.shape[0], ps,
                                   kv_scales.shape[-1]), kv_scales.shape
        kv_scales = kv_scales[page_indices][..., 0].astype(
            jnp.float32).reshape(B, PP * ps)  # gather first (see flat)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    scratch.append(pltpu.SemaphoreType.DMA((2, R, PP)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _rowblock_kernel, page_size=ps, rows_per_block=R,
        num_kv_heads=num_kv_heads, sm_scale=sm_scale,
        has_scales=has_scales)
    args = (p0, p1, lo.astype(jnp.int32), hi.astype(jnp.int32), nblocks,
            page_indices, q, kv_pages_l)
    if has_scales:
        args = args + (kv_scales,)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)


def rowblock_vmem_fits(rows_per_block: int, num_pages_bucket: int,
                       page_size: int, two_hkv: int, head_dim: int,
                       kv_itemsize: int, has_scales: bool = False) -> bool:
    """Whether the rowblock kernel's double-buffer (+ scale buffer for
    scaled-FP8 caches) fits scoped VMEM. THE single eligibility bound —
    shared by the dispatcher's kernel selection and the scaled-FP8 gate
    (ragged_attention.py) so they cannot drift."""
    # Scales no longer occupy kernel scratch (they arrive as one small
    # pre-gathered [B, cs] f32 VMEM input), so the bound is the KV
    # double-buffer alone.
    del has_scales
    per_slot = head_dim * kv_itemsize
    buf = (2 * rows_per_block * num_pages_bucket * page_size * two_hkv *
           per_slot)
    return buf <= 12 * 2**20


def visible_range(kv_lens: jax.Array, sliding_window=None, chunk_size=None
                  ) -> tuple[jax.Array, jax.Array]:
    """Per-row [lo, hi) visible key range for the last-token query at
    position kv_len - 1 (matches the dense path's mask semantics:
    ops/ragged_attention.py:_dense_attention)."""
    hi = kv_lens
    q_pos = kv_lens - 1
    lo = jnp.zeros_like(kv_lens)
    if sliding_window is not None:
        lo = jnp.maximum(lo, q_pos - sliding_window + 1)
    if chunk_size is not None:
        lo = jnp.maximum(lo, (q_pos // chunk_size) * chunk_size)
    return lo, hi


def _verify_kernel(
    # scalar prefetch
    p0_ref, p1_ref, lo_ref, hi_ref, crow_ref, clocal_ref, contig_ref,
    total_ref, page_indices_ref,
    # inputs, outputs, scratch
    q_ref, kv_hbm_ref, o_ref, kv_buf, sem,
    *, page_size: int, pages_per_chunk: int, num_kv_heads: int,
    sm_scale: float, tokens_per_row: int,
):
    """Multi-token paged verify attention — the speculative-verification
    analogue of the fused flat-stream decode kernel. Row r carries T =
    tokens_per_row query tokens at positions hi_r - T .. hi_r - 1 sharing
    ONE page stream (the draft + bonus tokens of a fused spec round), so
    the HBM traffic equals a decode call while the matmul M grows to
    T*Hq. Visibility is per TOKEN: token t of row r sees keys
    [lo_r, hi_r - (T-1) + t).

    Rationale (round-5, measured): the dense spec-verify path made one 8B
    fused spec ROUND cost ~204 ms at b64 (vs a ~21 ms plain decode step)
    — spec could never win at 8B regardless of acceptance. With the paged
    verify kernel a round's attention is decode-priced.
    """
    ps = page_size
    C = pages_per_chunk
    cs = C * ps
    TH, Dp = q_ref.shape[1], q_ref.shape[2]
    Hkv = num_kv_heads
    T = tokens_per_row
    Hq = TH // T
    G = Hq // Hkv
    TT = total_ref[0]
    MAXC = crow_ref.shape[0]

    o_ref[:] = jnp.zeros_like(o_ref)
    kv_buf[...] = jnp.zeros(kv_buf.shape, kv_buf.dtype)  # stale-NaN guard

    # Row i (= t*Hq + h) has K slot 2*(h//G), V slot 2*(h//G)+1.
    hrow = jax.lax.broadcasted_iota(jnp.int32, (TH, 2 * Hkv, 1), 0) % Hq
    slotid = jax.lax.broadcasted_iota(jnp.int32, (TH, 2 * Hkv, 1), 1)
    mask_k = slotid == (hrow // G) * 2
    mask_v = slotid == (hrow // G) * 2 + 1
    # Per-query-row token index (t = i // Hq) for the causal offset.
    tok_of_row = jax.lax.broadcasted_iota(
        jnp.int32, (TH, cs), 0) // Hq                     # [TH, cs]
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, cs), 1)

    start_chunk_dma, wait_chunk = _chunk_dma_fns(
        contig_ref, crow_ref, clocal_ref, p0_ref, p1_ref,
        page_indices_ref, kv_hbm_ref, kv_buf, sem, C,
        page_indices_ref.shape[1])

    @pl.when(TT > 0)
    def _():
        start_chunk_dma(0, 0)

    def body(t, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < TT)
        def _():
            start_chunk_dma(t + 1, 1 - slot)

        wait_chunk(t, slot)
        r = crow_ref[t]
        cl = clocal_ref[t]
        lo = lo_ref[r]
        hi = hi_ref[r]
        first = cl == 0
        m_prev = jnp.where(first, jnp.full_like(m_prev, -jnp.inf), m_prev)
        l_prev = jnp.where(first, jnp.zeros_like(l_prev), l_prev)
        acc = jnp.where(first, jnp.zeros_like(acc), acc)

        q = (q_ref[r].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
        q_exp = (q[:, None, :] *
                 mask_k.astype(q.dtype)).reshape(TH, 2 * Hkv * Dp)
        kvf = kv_buf[slot].reshape(cs, 2 * Hkv * Dp)
        s = jax.lax.dot_general(
            q_exp, kvf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TH, cs]
        base = (p0_ref[r] + cl * C) * ps
        kpos = base + col
        # Token t of the row sees keys < hi - (T-1) + t.
        vis = (kpos >= lo) & (kpos < hi - (T - 1) + tok_of_row)
        s = jnp.where(vis, s, _MASK)

        m_cur = jnp.max(s, axis=-1, keepdims=True)        # [TH, 1]
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        p_lo = p.astype(kv_buf.dtype)
        o16 = jax.lax.dot_general(
            p_lo, kvf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TH, 2Hkv*Dp]
        o = jnp.sum(o16.reshape(TH, 2 * Hkv, Dp) * mask_v, axis=1)
        acc = acc * alpha + o                             # [TH, Dp]

        t_nxt = jnp.minimum(t + 1, MAXC - 1)
        is_last = jnp.logical_or(t + 1 >= TT, crow_ref[t_nxt] != r)

        @pl.when(is_last)
        def _():
            l_inv = jnp.where(l_next == 0.0, 0.0, 1.0 / l_next)
            o_ref[r] = (acc * l_inv).astype(o_ref.dtype)

        return m_next, l_next, acc

    m0 = jnp.full((TH, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((TH, 1), jnp.float32)
    a0 = jnp.zeros((TH, Dp), jnp.float32)
    jax.lax.fori_loop(0, TT, body, (m0, l0, a0))


@functools.partial(
    jax.jit,
    static_argnames=("num_kv_heads", "sm_scale", "tokens_per_row",
                     "pages_per_chunk", "interpret"))
def decode_paged_attention_verify(q: jax.Array, kv_pages_l: jax.Array,
                                  lo: jax.Array, hi: jax.Array,
                                  page_indices: jax.Array, *,
                                  num_kv_heads: int, sm_scale: float,
                                  tokens_per_row: int,
                                  pages_per_chunk: int = None,
                                  interpret: bool = False) -> jax.Array:
    """Multi-token paged verify attention (see _verify_kernel).

    q: [B*T, Hq, Dp] with row r's T tokens at r*T..r*T+T-1 (t-ascending);
    lo/hi: [B] visible key range where hi is the row's FINAL kv_len (after
    all T writes; hi <= 0 pads); page_indices: [B, PP].
    Returns [B*T, Hq, Dp].
    """
    BT, Hq, Dp = q.shape
    T = tokens_per_row
    B = BT // T
    assert B * T == BT
    _, ps, two_hkv, Dp2 = kv_pages_l.shape
    assert Dp == Dp2 and two_hkv == 2 * num_kv_heads
    PP = page_indices.shape[1]
    if pages_per_chunk is None:
        # Like the decode auto-chunk, minus the [B, T*Hq, Dp] q block the
        # verify kernel additionally keeps resident.
        slot_bytes = ps * two_hkv * Dp * kv_pages_l.dtype.itemsize
        q_bytes = B * T * Hq * Dp * q.dtype.itemsize
        budget = max(1 * 2**20, 9 * 2**20 - q_bytes)
        pages_per_chunk = max(1, min(PP, 20, budget // (2 * slot_bytes)))
    C = min(pages_per_chunk, PP)
    max_cpr = (PP + C - 1) // C
    MAXC = B * max_cpr

    # [B*T, Hq, Dp] t-fastest -> [B, T*Hq, Dp] rows (t-major inside a row).
    qr = q.reshape(B, T * Hq, Dp)

    active = hi > 0
    p0 = jnp.where(active, lo // ps, 0).astype(jnp.int32)
    p1 = jnp.where(active, (hi + ps - 1) // ps, 0).astype(jnp.int32)
    crow, clocal, contig, total = _chunk_tables(
        p0, p1, page_indices, kv_pages_l.shape[0], C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pl.ANY),       # kv pages in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, ps, two_hkv, Dp), kv_pages_l.dtype),
            pltpu.SemaphoreType.DMA((2, C)),
        ],
    )
    kernel = functools.partial(
        _verify_kernel, page_size=ps, pages_per_chunk=C,
        num_kv_heads=num_kv_heads, sm_scale=sm_scale, tokens_per_row=T)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T * Hq, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(p0, p1, lo.astype(jnp.int32), hi.astype(jnp.int32), crow, clocal,
      contig, total, page_indices, qr, kv_pages_l)
    return out.reshape(BT, Hq, Dp)
