# SPDX-License-Identifier: Apache-2.0
"""Flash (tiled, online-softmax) context-encoding attention.

The dense prefill path (ops/ragged_attention._prefill_attention_dense)
materializes the full [T, C] score tensor per head — ~2 GB of f32 at
T=C=4096 on an 8B config, an HBM-traffic cliff and an OOM risk next to
8.6 GB of weights. This kernel is the TPU analogue of the reference's NKI
context-encoding kernel (kernel_q_tile_size=128 / kernel_kv_tile_size=4096,
/root/reference/test/tiny/test_chunked_prefill_inference.py:78-82): q tiles
stream against kv tiles with a running (max, sum, acc) carry in VMEM, so
score tiles never leave the chip.

Layout: the caller gathers the sequence's pages to a dense [C, Hkv, D]
context (one pass over the live KV — the same traffic the dense path pays),
then the kernel runs grid (Hkv, T/TQ, C/TC) with the kv dimension innermost
and sequential. Causal masking is positional: query row t has absolute
position q_start + t (q_start = kv_len - q_len > 0 for prefix-cache hits
and chunked continuations); kv column c is visible iff c <= pos(t) and
c < kv_len. Fully-masked kv tiles are skipped (compute and carry update
predicated off), so a chunked continuation pays only for the live prefix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -2.0**30


def _flash_kernel(qstart_ref, kvlen_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, tq: int, tc: int, G: int,
                  sm_scale: float, nc: int):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    jj = pl.program_id(2)
    q_start = qstart_ref[0]
    kv_len = kvlen_ref[0]
    rows = tq * G

    @pl.when(jj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Tile visibility: lowest kv position in this tile must be visible to
    # SOME query row (causal upper bound = q_start + (i+1)*tq - 1) and lie
    # inside the live context.
    first_c = jj * tc
    visible = (first_c <= q_start + (i + 1) * tq - 1) & (first_c < kv_len)

    @pl.when(visible)
    def _body():
        q = q_ref[0].reshape(rows, q_ref.shape[-1])  # [tq*G, D]
        k = k_ref[0]  # [tc, D]
        v = v_ref[0]  # [tc, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [rows, tc]
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, tc), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, tc), 1) + first_c
        pos_q = q_start + i * tq + r // G
        mask = (c <= pos_q) & (c < kv_len)
        s = jnp.where(mask, s, _NEG_INF)
        m_old = m_ref[:, :1]  # [rows, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # masked cols: exp(-inf - m) = 0
        alpha = jnp.exp(m_old - m_new)  # [rows, 1]
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(jj == nc - 1)
    def _final():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = out.reshape(tq, G, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "tq", "tc",
                                             "interpret"))
def flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                  q_start: jax.Array, kv_len: jax.Array, *,
                  sm_scale: float, tq: int = 256, tc: int = 512,
                  interpret: bool = False) -> jax.Array:
    """q: [T, Hq, D] (T a context bucket, D lane-padded); k/v: [C, Hkv, D]
    dense context (C a page-bucket * page_size multiple); q_start/kv_len:
    scalars. Returns [T, Hq, D] in q.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, Hq, D = q.shape
    C, Hkv, _ = k.shape
    G = Hq // Hkv
    tq = min(tq, T)
    tc = min(tc, C)
    while T % tq:
        tq //= 2
    while C % tc:
        tc //= 2
    nq, nc = T // tq, C // tc
    rows = tq * G

    qr = q.reshape(T, Hkv, G, D).transpose(1, 0, 2, 3)  # [Hkv, T, G, D]
    kr = k.transpose(1, 0, 2)  # [Hkv, C, D]
    vr = v.transpose(1, 0, 2)
    scalars = (jnp.asarray(q_start, jnp.int32).reshape(1),
               jnp.asarray(kv_len, jnp.int32).reshape(1))

    kernel = functools.partial(_flash_kernel, tq=tq, tc=tc, G=G,
                               sm_scale=sm_scale, nc=nc)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Hkv, nq, nc),
            in_specs=[
                pl.BlockSpec((1, tq, G, D), lambda h, i, j, *_: (h, i, 0, 0)),
                pl.BlockSpec((1, tc, D), lambda h, i, j, *_: (h, j, 0)),
                pl.BlockSpec((1, tc, D), lambda h, i, j, *_: (h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, tq, G, D),
                                   lambda h, i, j, *_: (h, i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),  # running max
                pltpu.VMEM((rows, 128), jnp.float32),  # running sum
                pltpu.VMEM((rows, D), jnp.float32),    # unnormalized acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, T, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*scalars, qr, kr, vr)
    return out.transpose(1, 0, 2, 3).reshape(T, Hq, D)
