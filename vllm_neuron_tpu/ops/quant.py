# SPDX-License-Identifier: Apache-2.0
"""Weight quantization (INT8 / FP8-e4m3) and fused dequant-matmul.

TPU-native equivalent of the reference stack's quantized path (NxDI
``neuron_quant`` per-tensor/per-channel symmetric INT8 and fbgemm FP8;
reference config surface: vllm_neuron/worker/neuronx_distributed_model_loader
.py:886-898, platform.py:30). Scheme: per-output-channel symmetric scales —
``w ≈ w_q * scale`` with ``w_q`` int8 (or float8_e4m3), ``scale`` f32 per
output column.

The hot path is the Pallas fused dequant-GEMM: weights stream HBM->VMEM in
their quantized dtype (halving/quartering weight bandwidth — the decode
bottleneck) and are dequantized in VMEM right before hitting the MXU. The
jnp fallback (CPU, or any shape the kernel doesn't cover) dequantizes via
XLA with the same numerics.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INT8_MAX = 127.0
FP8_MAX = 448.0  # float8_e4m3fn finite max
INT4_MAX = 7.0  # symmetric [-7, 7] (avoid the asymmetric -8)
INT4_GROUP = 128  # default group size along K

QUANT_DTYPES = {
    "int8": jnp.int8,
    "fp8": jnp.float8_e4m3fn,
    "int4": jnp.int8,  # two nibbles per byte, split-half packed
}


def quantize_per_channel(w: np.ndarray, quant: str
                         ) -> tuple[np.ndarray, np.ndarray]:
    """w: [..., K, N] (quantized along the output/N axis, per channel).
    Returns (w_q [..., K, N], scale [..., 1, N] float32)."""
    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=-2, keepdims=True)  # [..., 1, N]
    qmax = INT8_MAX if quant == "int8" else FP8_MAX
    scale = np.maximum(absmax / qmax, 1e-12).astype(np.float32)
    scaled = wf / scale
    if quant == "int8":
        wq = np.clip(np.rint(scaled), -127, 127).astype(np.int8)
    elif quant == "fp8":
        import ml_dtypes
        wq = scaled.astype(ml_dtypes.float8_e4m3fn)
    else:
        raise ValueError(f"unknown quantization {quant!r}")
    return wq, scale


def int4_group_size_for(K: int, group_size: int) -> int:
    """Effective int4 group size for an input dim K: the configured size
    when it divides K, else one group per packed half (K even required by
    the nibble packing)."""
    if K % 2 != 0:
        raise ValueError(f"int4 packing requires an even input dim, got {K}")
    return group_size if K % group_size == 0 else K // 2


def quantize_int4_grouped(w: np.ndarray, group_size: int = INT4_GROUP
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-group INT4 along the input (K) axis — the extra
    bit-width below the reference's INT8/FP8 floor (decode on TPU is
    weight-HBM-bound; int4 halves that traffic again). w: [..., K, N] ->
    (packed [..., K/2, N] int8, scale [..., K/G, N] float32).

    Packing is SPLIT-HALF, not interleaved: byte[k] holds w[k] in the low
    nibble and w[k + K/2] in the high nibble. Unpacking is then a single
    sublane-contiguous concatenate — layout-friendly for the Mosaic
    kernel, no element interleave."""
    wf = np.asarray(w, np.float32)
    K = wf.shape[-2]
    group_size = int4_group_size_for(K, group_size)
    Kg = K // group_size
    g = wf.reshape(*wf.shape[:-2], Kg, group_size, wf.shape[-1])
    absmax = np.max(np.abs(g), axis=-2, keepdims=True)
    scale = np.maximum(absmax / INT4_MAX, 1e-12).astype(np.float32)
    q = np.clip(np.rint(g / scale), -7, 7).astype(np.int32)
    q = q.reshape(wf.shape)
    lo, hi = q[..., :K // 2, :], q[..., K // 2:, :]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.uint8).view(np.int8)
    return packed, scale.reshape(*wf.shape[:-2], Kg, wf.shape[-1])


def quantize_projections(container, names, quant_config,
                         expert_names=()) -> None:
    """THE quantization policy, shared by every model family (in place,
    host-side numpy). ``container`` is a dict of weights (stacked layout)
    or one per-layer dict. Dense ``names`` follow quant_config.quantization
    (int4 routes to grouped packing); ``expert_names`` are MoE expert
    stacks — always per-channel int8/fp8 (the grouped matmul applies
    scales post-dot; the int4 kernel covers dense projections only), and
    they quantize AS A UNIT: if any expert stack is in
    modules_to_not_convert, all of them stay dense (partial expert quant
    would leave the in-dispatch scale tuple inconsistent)."""
    if quant_config is None or not quant_config.enabled:
        return
    skip = set(quant_config.modules_to_not_convert)
    q = quant_config.quantization
    for name in names:
        if name in skip or name not in container:
            continue
        if q == "int4":
            wq, s = quantize_int4_grouped(np.asarray(container[name]),
                                          quant_config.int4_group_size)
        else:
            wq, s = quantize_per_channel(np.asarray(container[name]), q)
        container[name] = wq
        container[name + "_scale"] = s
    present = [n for n in expert_names if n in container]
    if not present:
        return
    if any(n in skip for n in expert_names):
        return  # expert unit skipped as a whole
    q8 = "int8" if q == "int4" else q
    for name in present:
        wq, s = quantize_per_channel(np.asarray(container[name]), q8)
        container[name] = wq
        container[name + "_scale"] = s


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., K/2, N] int8 -> [..., K, N] int32 in natural row order."""
    w32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    return jnp.concatenate([lo, hi], axis=-2)


# ---------------------------------------------------------------------------
# Fused dequant-GEMM (Pallas)
# ---------------------------------------------------------------------------


def _dequant_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    # Dequantize into bf16 right before the MXU (bf16 matmul units run at
    # full rate; f32 would be 8x slower on the compute-bound prefill path),
    # accumulate in f32.
    w = (w_ref[:].astype(jnp.float32) * s_ref[:]).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _pick_tile(dim: int, target: int) -> int:
    t = min(dim, target)
    while dim % t != 0:
        t //= 2
    return max(t, 1)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _dequant_matmul_pallas(x, wq, scale, *, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = wq.shape[1]
    TM = _pick_tile(M, 128)
    TN = _pick_tile(N, 256)
    grid = (M // TM, N // TN)
    return pl.pallas_call(
        _dequant_matmul_kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + N * 4 + M * N * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, wq, scale)


def _dequant_matmul_int4_kernel(x_ref, w_ref, s_ref, o_ref):
    # Unpack nibbles (split-half: concat restores natural K order),
    # apply per-group scales via a broadcast reshape, dequantize to bf16
    # at the MXU door. All VPU work overlaps the (halved) weight DMA.
    w32 = w_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # [K, TN]
    Kg, TN = s_ref.shape
    K = q.shape[0]
    wf = (q.reshape(Kg, K // Kg, TN) * s_ref[:][:, None, :]).reshape(K, TN)
    o_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16),
                       wf.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "variant"))
def _dequant_matmul_int4_pallas(x, packed, scale, *, out_dtype,
                                interpret=False, variant=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = packed.shape[1]
    Kg = scale.shape[0]
    TM = _pick_tile(M, 128)
    TN = _pick_tile(N, 256)
    grid = (M // TM, N // TN)
    return pl.pallas_call(
        _INT4_KERNELS[variant or _int4_kernel_variant()],
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // 2, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 2 + Kg * N * 4 + M * N * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, packed, scale)


def _dequant_matmul_int4_kernel_v2(x_ref, w_ref, s_ref, o_ref):
    # Round-4 rework: the v1 kernel was VPU-bound (unpack + f32 grouped
    # scale multiply + reshapes ~5-8 passes over K*N swamped the halved
    # DMA; measured int4 e2e LOST to int8, docs/PERF_NOTES.md). Here the
    # scale never touches K*N elements: per-group dots on the UNSCALED
    # int4 values (exact in bf16), scales applied post-dot over the
    # [Kg, TM, TN] partials in f32 — mathematically identical to v1
    # (sum_k x_k q_kn) * s_gn, with strictly less rounding (the dot sees
    # exact +-7 values).
    w32 = w_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)  # [K, TN]
    x = x_ref[:].astype(jnp.bfloat16)
    Kg, TN = s_ref.shape
    K = q.shape[0]
    gs = K // Kg
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(Kg):
        part = jnp.dot(x[:, g * gs:(g + 1) * gs],
                       q[g * gs:(g + 1) * gs, :],
                       preferred_element_type=jnp.float32)
        acc = acc + part * s_ref[g][None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def _dequant_matmul_int4_kernel_v3(x_ref, w_ref, s_ref, o_ref):
    # One big MXU dot: unpack, convert to bf16, fold the per-group scale in
    # with a single bf16 multiply (the (Kg, gs, TN) reshape splits the
    # sublane dim in place), then [TM, K] @ [K, TN]. One fewer VPU pass
    # than v1 and full-size MXU work; the scale is rounded to bf16 (~2^-8
    # relative), the same order as the int4 quantization error itself.
    w32 = w_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)  # [K, TN]
    Kg, TN = s_ref.shape
    K = q.shape[0]
    s = s_ref[:].astype(jnp.bfloat16)
    wf = (q.reshape(Kg, K // Kg, TN) * s[:, None, :]).reshape(K, TN)
    o_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), wf,
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


_INT4_KERNELS = {
    "v1": _dequant_matmul_int4_kernel,
    "v2": _dequant_matmul_int4_kernel_v2,
    "v3": _dequant_matmul_int4_kernel_v3,
}


@functools.cache
def _int4_kernel_variant() -> str:
    import os
    return os.environ.get("VLLM_TPU_INT4_KERNEL", "v1")


@functools.cache
def _w4a8_tn() -> int:
    # W4A8 N-tile width: larger tiles cut the per-(M,N)-tile nibble-unpack
    # redundancy further at more VMEM per block (A/B knob).
    import os
    return int(os.environ.get("VLLM_TPU_W4A8_TN", "256"))


@functools.cache
def _int4_stacked_variant() -> str:
    # Decode-path stacked-kernel layout: "ktiled" (contiguous full-N weight
    # chunks, grid over K — sequential HBM stream) vs "block" (N-tiled
    # blocks — strided segment DMAs). A/B'd on chip before defaulting.
    import os
    return os.environ.get("VLLM_TPU_INT4_STACKED", "block")


def _ktiled_eligible(K: int, Kg: int) -> bool:
    # Groups must not straddle the packed halves: K/2 a multiple of the
    # group size (always true for the g128 default at 8B shapes).
    gs = K // Kg
    return K % 2 == 0 and gs > 0 and K % gs == 0 and (K // 2) % gs == 0


def _int4_stacked_kernel(l_ref, x_ref, w_ref, s_ref, o_ref):
    # Honor the VLLM_TPU_INT4_KERNEL v1/v2/v3 A/B knob on the stacked
    # (production decode) path too — it used to hardwire v1, silently
    # making A/B runs here measure v1 regardless of the env setting.
    _INT4_KERNELS[_int4_kernel_variant()](x_ref, w_ref.at[0], s_ref.at[0],
                                          o_ref)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def _dequant_matmul_int4_stacked_pallas(x, packed, scale, layer, *,
                                        out_dtype, interpret=False):
    """Layer-indexed fused dequant-GEMM over STACKED weights.

    packed: [L, K/2, N] int8 nibbles; scale: [L, Kg, N] f32; layer: traced
    scalar. Inside the model's layer scan, a plain dynamic-slice of the
    stacked weights cannot fuse into a Pallas custom call — XLA
    materializes a full copy of the layer's packed weights first (write +
    read of the whole array per layer per step, measured +23%..3x on the
    slice-in-scan microbench, perf/dequant_ab.py "sliced"). Here the layer
    index rides scalar prefetch and the kernel's BlockSpec index map DMAs
    tiles straight out of the stacked array — zero copies, the int4 HBM
    floor preserved."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = packed.shape[-1]
    Kg = scale.shape[-2]
    TM = _pick_tile(M, 128)
    TN = _pick_tile(N, 256)
    grid = (M // TM, N // TN)
    return pl.pallas_call(
        _int4_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j, lr: (i, 0)),
                pl.BlockSpec((1, K // 2, TN), lambda i, j, lr: (lr[0], 0, j)),
                pl.BlockSpec((1, Kg, TN), lambda i, j, lr: (lr[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, lr: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, packed, scale)


def _int4_ktiled_stacked_kernel(l_ref, xlo_ref, xhi_ref, w_ref, slo_ref,
                                shi_ref, o_ref, acc_ref):
    # K-tiled variant of the stacked kernel: the grid walks K (not N), each
    # weight block is [TK2 packed rows, FULL N] — a single CONTIGUOUS HBM
    # region (the N-tiled block layout DMAs ~K/2 strided 256-byte segments
    # per block, measured ~490 GB/s vs the XLA int8 dot's ~740 sequential;
    # docs/PERF_NOTES.md round-4 int4 accounting). Partial products
    # accumulate in a VMEM f32 scratch across grid steps. The lo/hi
    # activation columns and group scales arrive as SEPARATE inputs whose
    # BlockSpec index maps do the chunk slicing (Mosaic cannot lower
    # dynamic sublane/lane-offset vector loads inside the kernel).
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    w32 = w_ref[0].astype(jnp.int32)  # [TK2, N]
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    TK2, N = w32.shape
    G2 = slo_ref.shape[2]  # groups per half-chunk
    gs = TK2 // G2
    w_lo = (lo.astype(jnp.float32).reshape(G2, gs, N)
            * slo_ref[0, 0][:, None, :]).reshape(TK2, N).astype(jnp.bfloat16)
    w_hi = (hi.astype(jnp.float32).reshape(G2, gs, N)
            * shi_ref[0, 0][:, None, :]).reshape(TK2, N).astype(jnp.bfloat16)
    part = (jnp.dot(xlo_ref[:].astype(jnp.bfloat16), w_lo,
                    preferred_element_type=jnp.float32)
            + jnp.dot(xhi_ref[:].astype(jnp.bfloat16), w_hi,
                      preferred_element_type=jnp.float32))

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(k > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(k == nk - 1)
    def _out():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _ktiled_chunk(K2: int, gs: int, N: int,
                  target_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest packed-row count that (a) is a multiple of the group size,
    (b) divides K/2, (c) keeps the contiguous chunk near ``target_bytes``."""
    t = max(gs, (target_bytes // max(N, 1)) // gs * gs)
    t = min(t, K2)
    while K2 % t != 0:
        t -= gs
    return t


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def _dequant_matmul_int4_ktiled_stacked(x, packed, scale, layer, *,
                                        out_dtype, interpret=False):
    """K-tiled layer-indexed fused dequant-GEMM over stacked int4 weights:
    contiguous full-width weight DMAs (sequential across the K grid) instead
    of the N-tiled block layout's strided segments. packed: [L, K/2, N];
    scale: [L, Kg, N]; layer: traced scalar."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    K2 = K // 2
    N = packed.shape[-1]
    Kg = scale.shape[-2]
    gs2 = K2 // (Kg // 2)  # packed rows per group (= unpacked group size)
    TK2 = _ktiled_chunk(K2, gs2, N)
    NK = K2 // TK2  # chunk count (= x-hi block offset in TK2 units)
    G2 = TK2 // gs2
    L = packed.shape[0]
    # Chunk-blocked scale view: the sliced axis becomes a LEADING block dim
    # (Mosaic requires the last two block dims be 8/128-aligned or full).
    s4 = scale.reshape(L, Kg // G2, G2, N)
    return pl.pallas_call(
        _int4_ktiled_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NK,),
            in_specs=[
                pl.BlockSpec((M, TK2), lambda k, lr: (0, k)),
                pl.BlockSpec((M, TK2), lambda k, lr: (0, NK + k)),
                pl.BlockSpec((1, TK2, N), lambda k, lr: (lr[0], k, 0)),
                pl.BlockSpec((1, 1, G2, N), lambda k, lr: (lr[0], k, 0, 0)),
                pl.BlockSpec((1, 1, G2, N),
                             lambda k, lr: (lr[0], NK + k, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M, N), lambda k, lr: (0, 0)),
            scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, x, packed, s4, s4)


def _int4_w4a8_stacked_kernel(l_ref, x_ref, xs_ref, w_ref, s_ref, o_ref):
    # W4A8 for compute-bound (prefill-sized) steps: activations arrive
    # pre-quantized int8 (per-row symmetric), nibbles unpack to int8, the
    # MXU runs s8 x s8 -> s32 at 2x the bf16 rate, and each group's int32
    # partial is scaled post-dot by (row_scale x group_scale) in f32 —
    # the int4 analogue of _w8a8_matmul.
    w32 = w_ref[0].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)  # [K, TN]
    x = x_ref[:]  # [TM, K] int8
    xs = xs_ref[:, :1]  # [TM, 1] f32 row scales
    s = s_ref[0]  # [Kg, TN] f32 group scales
    Kg = s.shape[0]
    K = q.shape[0]
    gs = K // Kg
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(Kg):
        part = jax.lax.dot_general(
            x[:, g * gs:(g + 1) * gs], q[g * gs:(g + 1) * gs, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * s[g][None, :]
    o_ref[:] = (acc * xs).astype(o_ref.dtype)


def _int4_w4a8rq_stacked_kernel(groups_per_chunk, l_ref, x_ref, xs_ref,
                                w_ref, s_ref, o_ref):
    # W4A8 "requantize-chunk" variant: the per-group kernel issues Kg
    # (32-112) small s8 dots whose pipeline drains + f32 accumulate adds
    # cost ~10% of prefill throughput vs int8-W8A8's single big dot.
    # Here each CHUNK of `groups_per_chunk` groups is requantized in VMEM
    # onto a common int8 grid (step = 7*max_g s_gn / 127), so the MXU runs
    # one [TM, chunk]x[chunk, TN] s8 dot per chunk — 8x fewer dots — with
    # ONE post-dot scale per chunk. Requant error is bounded by the
    # chunk-LOCAL group-scale spread (spread > 18x would alias a group's
    # own grid; adjacent g128 groups measured far tighter — ppl-gated).
    w32 = w_ref[0].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(w32, 4)
    q = jnp.concatenate([lo, hi], axis=0)  # [K, TN] int32
    x = x_ref[:]  # [TM, K] int8
    xs = xs_ref[:, :1]  # [TM, 1] f32 row scales
    s = s_ref[0]  # [Kg, TN] f32 group scales
    Kg, TN = s.shape
    K = q.shape[0]
    gs = K // Kg
    G = groups_per_chunk
    C = Kg // G
    cs = K // C  # rows per chunk
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for c in range(C):
        sc = s[c * G:(c + 1) * G]  # [G, TN]
        smax = jnp.max(sc, axis=0, keepdims=True)  # [1, TN]
        f = sc / jnp.maximum(smax, 1e-12) * (127.0 / 7.0)  # [G, TN] <= 127/7
        qc = q[c * cs:(c + 1) * cs].astype(jnp.float32)
        w8 = jnp.round(qc.reshape(G, gs, TN) * f[:, None, :]) \
            .reshape(cs, TN).astype(jnp.int8)
        part = jax.lax.dot_general(
            x[:, c * cs:(c + 1) * cs], w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * (smax * (7.0 / 127.0))
    o_ref[:] = (acc * xs).astype(o_ref.dtype)


@functools.cache
def _w4a8_kernel_variant() -> str:
    # "group" = one s8 dot per scale group (exact); "rq" = requantize
    # 8-group chunks to a common int8 grid, 8x fewer dots (A/B knob).
    import os
    return os.environ.get("VLLM_TPU_W4A8_KERNEL", "group")


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def _dequant_matmul_int4_w4a8_stacked(x, packed, scale, layer, *,
                                      out_dtype, interpret=False):
    """W4A8 layer-indexed stacked GEMM (prefill path for int4 configs):
    per-token symmetric int8 activation quant outside the kernel, int8
    nibble-unpack + per-group s8xs8->s32 dots + post-dot f32 scales
    inside. packed: [L, K/2, N]; scale: [L, Kg, N]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = packed.shape[-1]
    Kg = scale.shape[-2]
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax / INT8_MAX, 1e-12)  # [M, 1]
    xi = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    xs_rep = jnp.broadcast_to(xs, (M, 128)).astype(jnp.float32)
    # Large M tiles: the kernel unpacks + per-group-dots the SAME weight
    # block once per M tile (grid iterates j fastest), so prefill-sized
    # calls at TM=128 redid the nibble unpack M/128 times. TM=512 quarters
    # that VPU work and feeds the MXU [512,128]x[128,TN] dots (measured
    # e2e: int4 prefill 10.3k -> 14.0k tok/s at the 8B b64 bench).
    TM = _pick_tile(M, 512)
    TN = _pick_tile(N, _w4a8_tn())
    grid = (M // TM, N // TN)
    kern = _int4_w4a8_stacked_kernel
    if _w4a8_kernel_variant() == "rq":
        G = 8
        while Kg % G != 0:
            G //= 2
        kern = functools.partial(_int4_w4a8rq_stacked_kernel, G)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j, lr: (i, 0)),
                pl.BlockSpec((TM, 128), lambda i, j, lr: (i, 0)),
                pl.BlockSpec((1, K // 2, TN), lambda i, j, lr: (lr[0], 0, j)),
                pl.BlockSpec((1, Kg, TN), lambda i, j, lr: (lr[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, lr: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xi, xs_rep, packed, scale)


class StackedInt4:
    """Marker placed in a layer's param dict by the model's layer scan:
    the UNSLICED stacked int4 weights + the traced layer index, so
    ``linear`` can dispatch the copy-free stacked kernel."""

    __slots__ = ("packed", "scale", "layer")

    def __init__(self, packed, scale, layer):
        self.packed = packed
        self.scale = scale
        self.layer = layer


def dequant_matmul_stacked_int4(x: jax.Array, ref: StackedInt4
                                ) -> jax.Array:
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = ref.packed.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if (jax.default_backend() != "cpu"
            and M % 8 == 0 and K % 256 == 0 and N % 128 == 0):
        min_rows = _w8a8_min_rows()
        if min_rows and M >= min_rows:
            # Prefill-sized: W4A8 (int8 activations, 2x MXU rate) — the
            # int4 analogue of the int8 W8A8 route; same threshold knob.
            out = _dequant_matmul_int4_w4a8_stacked(
                x2, ref.packed, ref.scale, ref.layer, out_dtype=x.dtype)
        elif (_int4_stacked_variant() == "ktiled"
              and _ktiled_eligible(K, ref.scale.shape[-2])):
            out = _dequant_matmul_int4_ktiled_stacked(
                x2, ref.packed, ref.scale, ref.layer, out_dtype=x.dtype)
        else:
            out = _dequant_matmul_int4_stacked_pallas(
                x2, ref.packed, ref.scale, ref.layer, out_dtype=x.dtype)
    else:
        out = _dequant_matmul_int4_jnp(
            x2, ref.packed[ref.layer], ref.scale[ref.layer], x.dtype)
    return out.reshape(*lead, N)


def _dequant_matmul_int4_jnp(x2, packed, scale, out_dtype):
    """XLA fallback (CPU tests / kernel-ineligible shapes). Materializes
    the dequantized block — on TPU this path loses the bandwidth win, so
    the Pallas kernel is the production route."""
    K = x2.shape[-1]
    Kg = scale.shape[-2]
    q = unpack_int4(packed).astype(jnp.float32)
    N = q.shape[-1]
    wf = (q.reshape(Kg, K // Kg, N) * scale[:, None, :]).reshape(K, N)
    return jnp.dot(x2, wf.astype(x2.dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)


@functools.cache
def _use_pallas() -> bool:
    # XLA is the default dequant path: it fuses the int8->bf16 convert into
    # the dot's operand read (int8 HBM traffic preserved) and, unlike a
    # custom call, pipelines with surrounding ops — measured 415 vs 236
    # tok/s on the 8B INT8 decode bench. The Mosaic kernel stays available
    # for platforms where XLA doesn't fuse (VLLM_TPU_DEQUANT_BACKEND=pallas).
    import os
    return os.environ.get("VLLM_TPU_DEQUANT_BACKEND") == "pallas"


@functools.cache
def _w8a8_min_rows() -> int:
    # Opt-in W8A8: dynamic per-token int8 activation quant so prefill
    # matmuls run int8 x int8 on the MXU (2x the bf16 rate on v5e; the
    # reference's NxDI exposes the analogous quantized-MLP kernels).
    # Decode stays on the dequant path: it is HBM-bound, activation quant
    # only adds work there. 0 disables.
    import os
    return int(os.environ.get("VLLM_TPU_W8A8_MIN_ROWS", "0"))


def _w8a8_matmul(x2: jax.Array, wq: jax.Array, scale: jax.Array
                 ) -> jax.Array:
    """x2: [M, K] float; wq: [K, N] int8; scale: [1, N] f32 (per-channel
    weight scale). Per-row symmetric activation quant, s8xs8->s32 dot."""
    xf = x2.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [M, 1]
    xs = jnp.maximum(absmax / INT8_MAX, 1e-12)
    xi = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xi, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * xs * scale).astype(x2.dtype)


def dequant_matmul(x: jax.Array, wq: jax.Array, scale: jax.Array,
                   backend: Optional[str] = None) -> jax.Array:
    """x: [..., K] (bf16/f32); wq: [K, N] int8/fp8; scale: [1, N] f32.
    Returns [..., N] in x.dtype."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = wq.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if wq.dtype == jnp.int8 and wq.shape[-2] * 2 == K:
        # Grouped INT4 (packed nibbles). Unlike int8, XLA cannot fuse the
        # group-scale multiply into the dot's operand read, so the Pallas
        # kernel is the production path (not env-gated). Under a mesh the
        # jnp chain is used instead: GSPMD partitions the unpack/scale/dot
        # chain (split-half concat keeps K-sharding consistent), while a
        # pallas_call would be replicated via all-gathered operands.
        from vllm_neuron_tpu.ops.ragged_attention import get_attention_mesh
        if (jax.default_backend() != "cpu" and backend != "jnp"
                and get_attention_mesh() is None
                and M % 8 == 0 and K % 256 == 0 and N % 128 == 0):
            out = _dequant_matmul_int4_pallas(x2, wq, scale,
                                              out_dtype=x.dtype)
        else:
            out = _dequant_matmul_int4_jnp(x2, wq, scale, x.dtype)
        return out.reshape(*lead, N)
    use_pallas = backend == "pallas" if backend else _use_pallas()
    min_rows = _w8a8_min_rows()
    if (min_rows and M >= min_rows and wq.dtype == jnp.int8
            and backend is None):
        return _w8a8_matmul(x2, wq, scale).reshape(*lead, N)
    # The kernel wants lane/sublane-friendly shapes; tiny/ragged shapes take
    # the XLA path.
    if use_pallas and M % 8 == 0 and K % 128 == 0 and N % 128 == 0:
        out = _dequant_matmul_pallas(x2, wq, scale, out_dtype=x.dtype)
    else:
        # Dequantize INTO THE ACTIVATION DTYPE: with bf16 activations the
        # MXU runs single-pass bf16 matmuls (f32 dots cost 3-6 bf16 passes
        # — measured 85ms -> ~2x faster prefill at 512 tokens on 8B INT8),
        # while the int8->bf16 convert+scale still fuses into the dot's
        # operand read so weight HBM traffic stays quantized. f32
        # activations (CPU tests, debug) keep full f32 numerics.
        w = (wq.astype(jnp.float32) * scale).astype(x.dtype)
        out = jnp.dot(x2, w, preferred_element_type=jnp.float32
                      ).astype(x.dtype)
    return out.reshape(*lead, N)


def linear(x: jax.Array, params: dict, name: str) -> jax.Array:
    """Apply the (possibly quantized) projection ``name`` from a param dict:
    quantized weights live as ``name`` (int8/fp8) + ``name + '_scale'``.
    A ``StackedInt4`` entry dispatches the layer-indexed copy-free kernel."""
    w = params[name]
    if isinstance(w, StackedInt4):
        return dequant_matmul_stacked_int4(x, w)
    scale = params.get(name + "_scale")
    if scale is None:
        return x @ w
    return dequant_matmul(x, w, scale)
