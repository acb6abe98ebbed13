# SPDX-License-Identifier: Apache-2.0
"""Pallas paged decode-attention kernel vs the dense XLA oracle.

Runs in Pallas interpret mode on CPU; the same kernel compiles via Mosaic on
TPU. The oracle is the production dense page-gather path
(ops/ragged_attention.py), itself pinned against HF in
tests/test_model_correctness.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_neuron_tpu.ops.decode_attention import (
    decode_paged_attention, decode_paged_attention_flat, visible_range)
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                  _decode_attention_dense)


def _setup(B=5, Hq=8, Hkv=2, Dp=128, ps=16, PP=6, num_pages=32, seed=0,
           kv_lens=None):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, Hq, Dp), np.float32)
    kv_pages = rng.standard_normal((num_pages, ps, 2 * Hkv, Dp),
                                   np.float32).astype(np.float32)
    if kv_lens is None:
        kv_lens = rng.integers(1, PP * ps + 1, size=B).astype(np.int32)
    else:
        kv_lens = np.asarray(kv_lens, np.int32)
    # Random distinct pages per row (page 0 is the shared null page).
    page_indices = np.zeros((B, PP), np.int32)
    for b in range(B):
        page_indices[b] = rng.choice(np.arange(1, num_pages), PP,
                                     replace=False)
    return (jnp.asarray(q), jnp.asarray(kv_pages), jnp.asarray(kv_lens),
            jnp.asarray(page_indices))


def _dense_oracle(q, kv_pages, kv_lens, page_indices, sm_scale,
                  sliding_window=None, chunk_size=None):
    B, PP = page_indices.shape
    meta = RaggedMeta(
        slot_mapping=jnp.full((B,), -1, jnp.int32),
        kv_lens=kv_lens,
        page_indices=page_indices,
        cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
        num_seqs=jnp.asarray([B], jnp.int32),
    )
    return _decode_attention_dense(q, kv_pages, meta, sm_scale,
                                   sliding_window, chunk_size)


@pytest.mark.parametrize("kv_lens", [None, [1, 7, 16, 33, 96]])
def test_matches_dense(kv_lens):
    q, kv_pages, lens, pages = _setup(kv_lens=kv_lens)
    sm = 0.125
    lo, hi = visible_range(lens)
    out = decode_paged_attention(q, kv_pages, lo, hi, pages,
                                 num_kv_heads=2, sm_scale=sm,
                                 pages_per_chunk=2, interpret=True)
    ref = _dense_oracle(q, kv_pages, lens, pages, sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_inactive_rows_zero():
    q, kv_pages, lens, pages = _setup(kv_lens=[10, 0, 25, 0, 1])
    lo, hi = visible_range(lens)
    out = np.asarray(decode_paged_attention(
        q, kv_pages, lo, hi, pages, num_kv_heads=2, sm_scale=1.0,
        pages_per_chunk=2, interpret=True))
    assert np.all(out[1] == 0.0) and np.all(out[3] == 0.0)
    ref = np.asarray(_dense_oracle(q, kv_pages, lens, pages, 1.0))
    np.testing.assert_allclose(out[[0, 2, 4]], ref[[0, 2, 4]],
                               rtol=2e-5, atol=2e-5)


def test_sliding_window():
    q, kv_pages, lens, pages = _setup(kv_lens=[40, 96, 3, 17, 64])
    sw = 24
    lo, hi = visible_range(lens, sliding_window=sw)
    out = decode_paged_attention(q, kv_pages, lo, hi, pages,
                                 num_kv_heads=2, sm_scale=0.2,
                                 pages_per_chunk=2, interpret=True)
    ref = _dense_oracle(q, kv_pages, lens, pages, 0.2, sliding_window=sw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_chunked_local():
    q, kv_pages, lens, pages = _setup(kv_lens=[40, 96, 3, 32, 64])
    cs = 32
    lo, hi = visible_range(lens, chunk_size=cs)
    out = decode_paged_attention(q, kv_pages, lo, hi, pages,
                                 num_kv_heads=2, sm_scale=0.2,
                                 pages_per_chunk=2, interpret=True)
    ref = _dense_oracle(q, kv_pages, lens, pages, 0.2, chunk_size=cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kv_lens", [None, [1, 7, 16, 33, 96],
                                     [10, 0, 25, 0, 1]])
@pytest.mark.parametrize("C", [1, 2, 3])
@pytest.mark.parametrize("fused", [False, True])
def test_flat_matches_dense(kv_lens, C, fused):
    q, kv_pages, lens, pages = _setup(kv_lens=kv_lens)
    sm = 0.125
    lo, hi = visible_range(lens)
    out = np.asarray(decode_paged_attention_flat(
        q, kv_pages, lo, hi, pages, num_kv_heads=2, sm_scale=sm,
        pages_per_chunk=C, fused_gqa=fused, interpret=True))
    ref = np.asarray(_dense_oracle(q, kv_pages, lens, pages, sm))
    active = np.asarray(lens) > 0
    np.testing.assert_allclose(out[active], ref[active],
                               rtol=2e-5, atol=2e-5)
    assert np.all(out[~active] == 0.0)


@pytest.mark.parametrize("fused", [False, True])
def test_flat_sliding_window(fused):
    q, kv_pages, lens, pages = _setup(kv_lens=[40, 96, 3, 17, 64])
    sw = 24
    lo, hi = visible_range(lens, sliding_window=sw)
    out = decode_paged_attention_flat(q, kv_pages, lo, hi, pages,
                                      num_kv_heads=2, sm_scale=0.2,
                                      pages_per_chunk=2, fused_gqa=fused,
                                      interpret=True)
    ref = _dense_oracle(q, kv_pages, lens, pages, 0.2, sliding_window=sw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flat_bf16_cache():
    q, kv_pages, lens, pages = _setup()
    q16 = q.astype(jnp.bfloat16)
    kv16 = kv_pages.astype(jnp.bfloat16)
    lo, hi = visible_range(lens)
    out = decode_paged_attention_flat(q16, kv16, lo, hi, pages,
                                      num_kv_heads=2, sm_scale=0.125,
                                      pages_per_chunk=2, interpret=True)
    ref = _dense_oracle(q16, kv16, lens, pages, 0.125)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_sharded_decode_matches_unsharded():
    """The shard_map head-parallel wrapper (ragged_attention.py) must be
    bit-identical to the single-device kernel: heads are independent, so
    splitting them over the model axis changes nothing numerically."""
    from vllm_neuron_tpu.ops import ragged_attention as ra
    from vllm_neuron_tpu.parallel.mesh import (DATA_AXIS, EXPERT_AXIS,
                                               MODEL_AXIS)
    from jax.sharding import Mesh

    q, kv_pages, lens, pages = _setup(B=4, Hq=8, Hkv=2, PP=4)
    sm = 0.125
    lo, hi = visible_range(lens)
    ref = decode_paged_attention_flat(q, kv_pages, lo, hi, pages,
                                      num_kv_heads=2, sm_scale=sm,
                                      pages_per_chunk=2, interpret=True)
    devs = np.asarray(jax.devices("cpu")[:2]).reshape(1, 1, 2)
    mesh = Mesh(devs, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS))
    old = ra.get_attention_mesh()
    ra.set_attention_mesh(mesh)
    try:
        # Partial-manual shard_map (auto data/expert axes) requires a jit
        # context — exactly how the executor always runs it.
        out = jax.jit(lambda *a: ra._pallas_decode_sharded(
            *a, num_kv_heads=2, sm_scale=sm, interpret=True))(
                q, kv_pages, lo, hi, pages)
    finally:
        ra.set_attention_mesh(old)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_cache():
    q, kv_pages, lens, pages = _setup()
    q16 = q.astype(jnp.bfloat16)
    kv16 = kv_pages.astype(jnp.bfloat16)
    lo, hi = visible_range(lens)
    out = decode_paged_attention(q16, kv16, lo, hi, pages,
                                 num_kv_heads=2, sm_scale=0.125,
                                 pages_per_chunk=2, interpret=True)
    ref = _dense_oracle(q16, kv16, lens, pages, 0.125)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_rowblock_matches_flat_reference():
    """Row-block single-pass kernel == flat-stream kernel across ragged
    lens (incl. empty rows) and every rows_per_block; also the rowblock
    production dispatcher's VMEM fallback path."""
    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_flat, decode_paged_attention_rowblock)

    q, kv_pages, lens, pages = _setup(B=8, Hq=8, Hkv=2, PP=6)
    sm = 0.125
    lo, hi = visible_range(lens)
    ref = decode_paged_attention_flat(q, kv_pages, lo, hi, pages,
                                      num_kv_heads=2, sm_scale=sm,
                                      pages_per_chunk=2, interpret=True)
    for R in (1, 2, 3, 8):
        got = decode_paged_attention_rowblock(
            q, kv_pages, lo, hi, pages, num_kv_heads=2, sm_scale=sm,
            rows_per_block=R, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"R={R}")


def test_rowblock_sliding_window():
    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_flat, decode_paged_attention_rowblock)

    q, kv_pages, lens, pages = _setup(B=4, Hq=8, Hkv=2, PP=6)
    sm = 0.125
    lo, hi = visible_range(lens, sliding_window=40)
    ref = decode_paged_attention_flat(q, kv_pages, lo, hi, pages,
                                      num_kv_heads=2, sm_scale=sm,
                                      pages_per_chunk=2, interpret=True)
    got = decode_paged_attention_rowblock(
        q, kv_pages, lo, hi, pages, num_kv_heads=2, sm_scale=sm,
        rows_per_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_rowblock_fp8_scales():
    """Scaled-FP8 pages through the rowblock kernel: the in-kernel
    dequant (fp8 value * per-slot scale, DMA'd alongside) must
    match the flat kernel run on the pre-dequantized pages."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_flat, decode_paged_attention_rowblock)

    q, kv_pages, lens, pages = _setup(B=4, Hq=8, Hkv=2, PP=6)
    rng = np.random.default_rng(4)
    # Per-slot scales, lane-replicated (the FP8KVCache layout):
    # [pages, ps, SCALE_LANES].
    from vllm_neuron_tpu.ops.ragged_attention import SCALE_LANES
    s_slot = rng.uniform(0.5, 2.0, size=kv_pages.shape[:2])
    scales = jnp.asarray(
        np.broadcast_to(s_slot[..., None],
                        kv_pages.shape[:2] + (SCALE_LANES,)), jnp.bfloat16)
    kv8 = kv_pages.astype(jnp.float8_e4m3fn)
    dequant = (kv8.astype(jnp.float32) *
               scales.astype(jnp.float32)[..., :1, None]).astype(q.dtype)
    sm = 0.125
    lo, hi = visible_range(lens)
    ref = decode_paged_attention_flat(q, dequant, lo, hi, pages,
                                      num_kv_heads=2, sm_scale=sm,
                                      pages_per_chunk=2, interpret=True)
    got = decode_paged_attention_rowblock(
        q, kv8, lo, hi, pages, num_kv_heads=2, sm_scale=sm,
        rows_per_block=2, interpret=True, kv_scales=scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flat_fused_fp8_scales():
    """Scaled-FP8 pages through the flat/fused kernels (round-3: the
    production default must not fall to the dense path on fp8 caches —
    the b48+fp8KV bench collapsed to ~196 tok/s through dense). In-kernel
    chunk dequant must match the kernel run on pre-dequantized pages."""
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_flat)

    q, kv_pages, lens, pages = _setup(B=4, Hq=8, Hkv=2, PP=6)
    rng = np.random.default_rng(4)
    from vllm_neuron_tpu.ops.ragged_attention import SCALE_LANES
    s_slot = rng.uniform(0.5, 2.0, size=kv_pages.shape[:2])
    scales = jnp.asarray(
        np.broadcast_to(s_slot[..., None],
                        kv_pages.shape[:2] + (SCALE_LANES,)), jnp.bfloat16)
    kv8 = kv_pages.astype(jnp.float8_e4m3fn)
    dequant = (kv8.astype(jnp.float32) *
               scales.astype(jnp.float32)[..., :1, None]).astype(q.dtype)
    sm = 0.125
    lo, hi = visible_range(lens)
    for fused in (True, False):
        for C in (2, 6):
            ref = decode_paged_attention_flat(
                q, dequant, lo, hi, pages, num_kv_heads=2, sm_scale=sm,
                pages_per_chunk=C, fused_gqa=fused, interpret=True)
            got = decode_paged_attention_flat(
                q, kv8, lo, hi, pages, num_kv_heads=2, sm_scale=sm,
                pages_per_chunk=C, fused_gqa=fused, interpret=True,
                kv_scales=scales)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2,
                err_msg=f"fused={fused} C={C}")


def test_engine_fp8_kv_with_rowblock_kernel(tiny_llama_dir):
    """Engine-level: kv_cache_dtype=fp8 with VLLM_TPU_DECODE_KERNEL=
    rowblock serves and matches the dense-path fp8 output (the round-2
    wiring: scaled caches previously always fell back to dense)."""
    import os

    from vllm_neuron_tpu import LLM, SamplingParams
    from vllm_neuron_tpu.ops import ragged_attention as ra

    prompts = [[5, 77, 301, 44, 12], list(range(200, 260))]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def run():
        llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
                  kv_cache_dtype="fp8")
        outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                            [sp, sp])
        return [o.outputs[0].token_ids for o in outs]

    base = run()  # dense path (default kernel variant is not rowblock)
    os.environ["VLLM_TPU_DECODE_KERNEL"] = "rowblock"
    ra._decode_kernel_fn.cache_clear()
    # CPU runs the dense path anyway (backend != pallas on cpu), so force
    # the kernel selection through the dispatch by checking eligibility
    # only — the real-kernel equivalence is covered in interpret mode
    # above; here we assert the engine result is unchanged by the env.
    try:
        got = run()
    finally:
        del os.environ["VLLM_TPU_DECODE_KERNEL"]
        ra._decode_kernel_fn.cache_clear()
    assert got == base


def test_flat_contiguous_run_dma_paths():
    """The contiguous-run fast path (one C-page DMA per chunk when the
    pool pages are consecutive) must be exact against the dense oracle for
    every run structure: fully contiguous rows (fast path), scrambled rows
    (per-page fallback), a row whose run breaks mid-chunk, and a
    contiguous row whose slice would run off the END of the pool
    (start+C > num_pages -> fallback)."""
    import numpy as np
    B, Hq, Hkv, Dp, ps, PP, num_pages = 4, 8, 2, 128, 16, 6, 32
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, Hq, Dp)), jnp.float32)
    kv_pages = jnp.asarray(
        rng.standard_normal((num_pages, ps, 2 * Hkv, Dp)), jnp.float32)
    kv_lens = jnp.asarray([90, 95, 96, 70], jnp.int32)
    pages = np.zeros((B, PP), np.int32)
    pages[0] = np.arange(1, 7)            # fully contiguous
    pages[1] = [20, 9, 3, 15, 25, 11]     # scrambled: per-page fallback
    pages[2] = [7, 8, 9, 17, 18, 19]      # run breaks at chunk boundary
    pages[3] = [28, 29, 30, 31, 1, 2]     # tail slice would exceed pool
    pages = jnp.asarray(pages)
    sm = 1.0 / np.sqrt(Dp)
    lo, hi = visible_range(kv_lens)
    ref = _dense_oracle(q, kv_pages, kv_lens, pages, sm)
    for C in (2, 3, 6):
        for fused in (False, True):
            out = decode_paged_attention_flat(
                q, kv_pages, lo, hi, pages, num_kv_heads=Hkv,
                sm_scale=sm, pages_per_chunk=C, fused_gqa=fused,
                interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5,
                err_msg=f"C={C} fused={fused}")


def test_verify_kernel_matches_dense_oracle():
    """Multi-token paged verify kernel vs _spec_verify_attention_dense:
    ragged kv_lens, pad rows (kv_len 0), contiguous AND scrambled page
    tables, T in {1, 3, 5}."""
    import numpy as np

    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_verify)
    from vllm_neuron_tpu.ops.ragged_attention import (
        RaggedMeta, _spec_verify_attention_dense)

    B, Hq, Hkv, Dp, ps, PP, num_pages = 4, 8, 2, 128, 16, 6, 40
    rng = np.random.default_rng(9)
    kv_pages = jnp.asarray(
        rng.standard_normal((num_pages, ps, 2 * Hkv, Dp)), jnp.float32)
    pages = np.zeros((B, PP), np.int32)
    pages[0] = np.arange(1, 7)           # contiguous
    pages[1] = [20, 9, 3, 15, 25, 11]    # scrambled
    pages[2] = np.arange(30, 36)         # contiguous near pool end
    pages[3] = [7, 8, 9, 17, 18, 19]
    pages = jnp.asarray(pages)
    sm = 1.0 / np.sqrt(Dp)
    for T in (1, 3, 5):
        kv_lens = jnp.asarray([90, 95, T, 0], jnp.int32)  # row3 = pad
        q = jnp.asarray(rng.standard_normal((B * T, Hq, Dp)), jnp.float32)
        meta = RaggedMeta(
            slot_mapping=jnp.full((B * T,), -1, jnp.int32),
            kv_lens=kv_lens, page_indices=pages,
            cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32) * T,
            num_seqs=jnp.asarray([B], jnp.int32))
        ref = np.asarray(_spec_verify_attention_dense(
            q, kv_pages, meta, sm, None))
        got = np.asarray(decode_paged_attention_verify(
            q, kv_pages, jnp.zeros_like(kv_lens), kv_lens, pages,
            num_kv_heads=Hkv, sm_scale=sm, tokens_per_row=T,
            interpret=True))
        # Pad row (kv_len 0) outputs are discarded by the caller; compare
        # active rows only (the dense path computes garbage there too).
        act = np.repeat(np.asarray(kv_lens) > 0, T)
        np.testing.assert_allclose(got[act], ref[act], atol=2e-5,
                                   err_msg=f"T={T}")
        # Small-chunk variants exercise the flash carry across chunks.
        for C in (1, 2):
            got_c = np.asarray(decode_paged_attention_verify(
                q, kv_pages, jnp.zeros_like(kv_lens), kv_lens, pages,
                num_kv_heads=Hkv, sm_scale=sm, tokens_per_row=T,
                pages_per_chunk=C, interpret=True))
            np.testing.assert_allclose(got_c[act], ref[act], atol=2e-5,
                                       err_msg=f"T={T} C={C}")


def test_verify_sharded_matches_unsharded():
    """_pallas_verify_sharded (shard_map over the model-axis head split)
    must match the single-device verify kernel — the TP path for fused
    speculation's multi-token verify."""
    import jax
    import numpy as np

    from vllm_neuron_tpu.ops.decode_attention import (
        decode_paged_attention_verify)
    from vllm_neuron_tpu.ops.ragged_attention import (
        _pallas_verify_sharded, set_attention_mesh)
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS

    devs = jax.devices()[:4]
    mesh = jax.sharding.Mesh(np.array(devs).reshape(1, 1, 4),
                             ("data", "expert", MODEL_AXIS))
    B, T, Hq, Hkv, Dp, ps, PP, num_pages = 3, 3, 8, 4, 128, 16, 4, 24
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((B * T, Hq, Dp)), jnp.float32)
    kv_pages = jnp.asarray(
        rng.standard_normal((num_pages, ps, 2 * Hkv, Dp)), jnp.float32)
    pages = jnp.asarray(
        rng.choice(np.arange(1, num_pages), (B, PP), replace=False)
        if num_pages > B * PP else
        np.arange(1, 1 + B * PP).reshape(B, PP)).astype(jnp.int32)
    kv_lens = jnp.asarray([50, 33, T], jnp.int32)
    lo = jnp.zeros_like(kv_lens)
    sm = 1.0 / np.sqrt(Dp)
    want = np.asarray(decode_paged_attention_verify(
        q, kv_pages, lo, kv_lens, pages, num_kv_heads=Hkv, sm_scale=sm,
        tokens_per_row=T, interpret=True))
    set_attention_mesh(mesh)
    try:
        got = np.asarray(jax.jit(lambda *a: _pallas_verify_sharded(
            *a, num_kv_heads=Hkv, sm_scale=sm, tokens_per_row=T,
            interpret=True))(q, kv_pages, lo, kv_lens, pages))
    finally:
        set_attention_mesh(None)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
