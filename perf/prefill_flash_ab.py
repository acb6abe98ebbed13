# SPDX-License-Identifier: Apache-2.0
"""A/B: dense page-gather prefill attention vs the flash kernel at long
context (8B attention geometry). Run ALONE on the TPU.

    python perf/prefill_flash_ab.py [ctx ...]    (default 1024 2048 4096 8192)

Per ctx: one layer's prefill attention call, q_len = kv_len = ctx (worst
case), page size 32. Dense is skipped where its [T, C] f32 scores would
not fit next to real model state (>= 8192). Numerics cross-check on the
smallest ctx."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vllm_neuron_tpu/compiled"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.timing import measure_rtt, time_op
from vllm_neuron_tpu.ops.prefill_attention import flash_prefill
from vllm_neuron_tpu.ops.ragged_attention import (RaggedMeta, _gather_ctx,
                                                  _prefill_attention_dense)

Hq, Hkv, D, PS = 32, 8, 128, 32
SM = D**-0.5


def main():
    ctxs = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]
    rtt = measure_rtt()
    print(f"8B attn geometry Hq={Hq} Hkv={Hkv} D={D}; rtt={rtt*1e3:.1f}ms")
    rng = np.random.default_rng(0)
    for ctx in ctxs:
        PP = ctx // PS
        pages = jnp.asarray(rng.standard_normal(
            (PP + 1, PS, 2 * Hkv, D)).astype(np.float32) * 0.3,
            jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal(
            (ctx, Hq, D)).astype(np.float32) * 0.3, jnp.bfloat16)
        meta = RaggedMeta(
            slot_mapping=jnp.zeros(ctx, jnp.int32),
            kv_lens=jnp.asarray([ctx], jnp.int32),
            page_indices=jnp.arange(1, PP + 1, dtype=jnp.int32)[None],
            cu_q_lens=jnp.asarray([0, ctx], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32))

        def flash_call(x):
            k, v = _gather_ctx(pages, meta.page_indices[:1])
            o = flash_prefill(x, k[0], v[0], 0, ctx, sm_scale=SM)
            return o.astype(x.dtype)

        t_flash = time_op(flash_call, q, scan=4, dispatches=4, rtt=rtt)
        line = f"ctx {ctx:5d}: flash {t_flash*1e3:8.2f} ms"
        if ctx < 8192:
            def dense_call(x):
                return _prefill_attention_dense(
                    x, pages, meta, SM, None).astype(x.dtype)
            t_dense = time_op(dense_call, q, scan=4, dispatches=4, rtt=rtt)
            line += f"  dense {t_dense*1e3:8.2f} ms"
            if ctx == ctxs[0]:
                a = np.asarray(flash_call(q), np.float32)
                b = np.asarray(dense_call(q), np.float32)
                line += f"  maxerr {np.abs(a-b).max():.3e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
