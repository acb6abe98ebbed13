# SPDX-License-Identifier: Apache-2.0
"""Flash (tiled online-softmax) prefill kernel numerics
(ops/prefill_attention.py, the SURVEY-N2 context-encoding kernel; reference
analogue: the NKI CE kernel with kernel_kv_tile_size=4096,
/root/reference/test/tiny/test_chunked_prefill_inference.py:78-82).

Interpret mode on CPU; exactness vs a straight-softmax numpy reference
across plain prefill, prefix-cache-hit windows (q_start > 0), GQA and MHA
head layouts, and partial final kv tiles."""
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_neuron_tpu.ops.prefill_attention import flash_prefill


def _ref(q, k, v, q_start, kv_len, sm_scale):
    T, Hq, D = q.shape
    C, Hkv, _ = k.shape
    G = Hq // Hkv
    qf = np.asarray(q, np.float32).reshape(T, Hkv, G, D)
    s = np.einsum("tkgd,ckd->tkgc", qf, np.asarray(k, np.float32)) * sm_scale
    pos_q = q_start + np.arange(T)
    c = np.arange(C)
    mask = (c[None] <= pos_q[:, None]) & (c[None] < kv_len)
    s = np.where(mask[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("tkgc,ckd->tkgd", p,
                     np.asarray(v, np.float32)).reshape(T, Hq, D)


CASES = [
    # T, C, Hq, Hkv, q_start, kv_len
    (256, 512, 8, 2, 0, 200),     # plain prefill, ctx shorter than bucket
    (256, 512, 8, 2, 100, 356),   # prefix-cache hit / chunked continuation
    (128, 256, 4, 4, 0, 256),     # MHA, exact bucket fill
    (512, 512, 8, 2, 0, 512),     # full tile grid
    (256, 768, 8, 2, 500, 756),   # long cached prefix, short window
]


@pytest.mark.parametrize("T,C,Hq,Hkv,q_start,kv_len", CASES)
def test_flash_matches_reference(T, C, Hq, Hkv, q_start, kv_len):
    D = 128
    rng = np.random.default_rng(T + C + q_start)
    q = (rng.standard_normal((T, Hq, D)) * 0.3).astype(np.float32)
    k = (rng.standard_normal((C, Hkv, D)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((C, Hkv, D)) * 0.3).astype(np.float32)
    got = np.asarray(flash_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), q_start, kv_len,
        sm_scale=D**-0.5, tq=64, tc=128, interpret=True))
    want = _ref(q, k, v, q_start, kv_len, D**-0.5)
    q_len = kv_len - q_start
    np.testing.assert_allclose(got[:q_len], want[:q_len],
                               rtol=2e-5, atol=2e-5)


def test_flash_agrees_with_dense_prefill_path():
    """Same answer as the production dense path on a paged cache."""
    from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta,
                                                      _gather_ctx,
                                                      _prefill_attention_dense)
    rng = np.random.default_rng(0)
    ps, PP, Hkv, Hq, D = 16, 8, 2, 8, 128
    pages = jnp.asarray(
        rng.standard_normal((PP + 1, ps, 2 * Hkv, D)).astype(np.float32)
        * 0.3)
    T, kv_len, q_len = 128, 100, 60
    q = jnp.asarray((rng.standard_normal((T, Hq, D)) * 0.3)
                    .astype(np.float32))
    meta = RaggedMeta(
        slot_mapping=jnp.zeros(T, jnp.int32),
        kv_lens=jnp.asarray([kv_len], jnp.int32),
        page_indices=jnp.arange(1, PP + 1, dtype=jnp.int32)[None],
        cu_q_lens=jnp.asarray([0, q_len], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32))
    dense = np.asarray(_prefill_attention_dense(q, pages, meta,
                                                D**-0.5, None))
    k, v = _gather_ctx(pages, meta.page_indices[:1])
    flash = np.asarray(flash_prefill(q, k[0], v[0], kv_len - q_len, kv_len,
                                     sm_scale=D**-0.5, tq=64, tc=64,
                                     interpret=True))
    np.testing.assert_allclose(flash[:q_len], dense[:q_len],
                               rtol=2e-5, atol=2e-5)


def test_flash_sharded_matches_unsharded():
    """shard_map over the model axis (heads split) returns the same output
    as the single-device kernel — the TP path for long-context CE."""
    import jax
    from vllm_neuron_tpu.ops.ragged_attention import (_flash_prefill_sharded,
                                                      set_attention_mesh)
    from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS

    devs = jax.devices()[:4]
    mesh = jax.sharding.Mesh(np.array(devs).reshape(1, 1, 4),
                             ("data", "expert", MODEL_AXIS))
    rng = np.random.default_rng(7)
    T, C, Hq, Hkv, D = 128, 256, 8, 4, 128
    q = jnp.asarray((rng.standard_normal((T, Hq, D)) * 0.3)
                    .astype(np.float32))
    k = jnp.asarray((rng.standard_normal((C, Hkv, D)) * 0.3)
                    .astype(np.float32))
    v = jnp.asarray((rng.standard_normal((C, Hkv, D)) * 0.3)
                    .astype(np.float32))
    want = np.asarray(flash_prefill(q, k, v, 0, 200, sm_scale=D**-0.5,
                                    interpret=True))
    set_attention_mesh(mesh)
    try:
        # Partial-manual shard_map (auto data/expert axes) requires a jit
        # context — exactly how the executor always runs it.
        got = np.asarray(jax.jit(lambda *a: _flash_prefill_sharded(
            *a, sm_scale=D**-0.5, interpret=True))(q, k, v, 0, 200))
    finally:
        set_attention_mesh(None)
    np.testing.assert_allclose(got[:200], want[:200], rtol=2e-5, atol=2e-5)
