# SPDX-License-Identifier: Apache-2.0
"""Regression tests for the padded KV scatter.

JAX scatter wraps negative indices NumPy-style (slot -1 writes the LAST flat
slot) and only drops truly out-of-bounds indices, even under mode="drop".
Round-1 shipped pad slots as -1, silently corrupting the final slot of the
last page on every bucketed step with pad tokens (ADVICE.md, high severity).
These tests pin the fix: pads map to distinct OOB indices and touch nothing.
"""
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.ops.ragged_attention import write_kv_pages


def _mk_cache(num_pages=4, ps=8, hkv=2, d=16, fill=7.0):
    return jnp.full((num_pages, ps, 2 * hkv, d), fill, jnp.float32)


def test_pad_slots_do_not_touch_last_slot():
    cache = _mk_cache()
    num_pages, ps, two_hkv, d = cache.shape
    n = 6
    k = jnp.full((n, two_hkv // 2, d), 3.0, jnp.float32)
    v = jnp.full((n, two_hkv // 2, d), 5.0, jnp.float32)
    # Two valid slots, four pads.
    slots = jnp.array([2, 9, -1, -1, -1, -1], jnp.int32)
    out = np.asarray(write_kv_pages(cache, k, v, slots))
    flat = out.reshape(num_pages * ps, two_hkv, d)
    # Last flat slot (the -1 wrap target) must be untouched.
    assert np.all(flat[-1] == 7.0)
    # Valid slots were written: K at even heads, V at odd.
    assert np.all(flat[2][0::2] == 3.0)
    assert np.all(flat[2][1::2] == 5.0)
    assert np.all(flat[9][0::2] == 3.0)
    # Every slot other than 2 and 9 is untouched.
    mask = np.ones(num_pages * ps, bool)
    mask[[2, 9]] = False
    assert np.all(flat[mask] == 7.0)


def test_all_pad_step_is_noop():
    cache = _mk_cache(fill=1.25)
    n = 8
    hkv = cache.shape[2] // 2
    d = cache.shape[3]
    k = jnp.zeros((n, hkv, d), jnp.float32)
    v = jnp.zeros((n, hkv, d), jnp.float32)
    slots = jnp.full((n,), -1, jnp.int32)
    out = np.asarray(write_kv_pages(cache, k, v, slots))
    assert np.all(out == 1.25)


def test_layer_offset_pads_from_model_path():
    """The model loop computes slots_l = where(valid, slot + l*offset, -1);
    the flat multi-layer cache must still drop those pads."""
    L, pages, ps, hkv, d = 3, 4, 8, 1, 8
    flat_cache = jnp.zeros((L * pages, ps, 2 * hkv, d), jnp.float32)
    n = 4
    k = jnp.ones((n, hkv, d), jnp.float32)
    v = 2.0 * jnp.ones((n, hkv, d), jnp.float32)
    for layer in range(L):
        slots = np.full(n, -1, np.int32)
        slots[0] = 5 + layer * pages * ps
        flat_cache = write_kv_pages(flat_cache, k, v,
                                    jnp.asarray(slots))
    out = np.asarray(flat_cache).reshape(L * pages * ps, 2 * hkv, d)
    written = {5 + layer * pages * ps for layer in range(L)}
    for s in range(L * pages * ps):
        if s in written:
            assert np.all(out[s][0::2] == 1.0) and np.all(out[s][1::2] == 2.0)
        else:
            assert np.all(out[s] == 0.0), f"slot {s} corrupted"
