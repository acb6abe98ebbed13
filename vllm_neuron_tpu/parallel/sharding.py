# SPDX-License-Identifier: Apache-2.0
"""Sharding rules: how params, KV caches, and step inputs lay out over the
mesh.

Tensor parallelism (reference analogue: NxDI tp_degree inside the compiled
graph, model_loader.py:752-753):
  - q/k/v projections: output (head) dim sharded over "model"
  - o projection: input (head) dim sharded over "model"
  - gate/up: output dim sharded; down: input dim sharded
  - lm_head: vocab dim sharded -> logits all-gathered (the reference steers
    vLLM the same way via use_all_gather()=True, platform.py:217-219)
  - KV cache: kv-head dim sharded over "model"
  - embeddings: replicated (gather is cheap, vocab-sharded gather is not)

With these input shardings, XLA/GSPMD inserts exactly the classic Megatron
collective pattern (one all-reduce after attention, one after MLP, one
all-gather for logits) over ICI — no hand-written collectives in the model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vllm_neuron_tpu.parallel.mesh import EXPERT_AXIS, MODEL_AXIS
from vllm_neuron_tpu.utils import init_logger

logger = init_logger(__name__)

# Param-tree path suffix -> PartitionSpec (leading layer axis is axis 0 for
# stacked layer params).
LAYER_PARAM_SPECS = {
    "wqkv": P(None, None, MODEL_AXIS),
    "bqkv": P(None, MODEL_AXIS),
    "wgu": P(None, None, MODEL_AXIS),
    "wqkv_scale": P(None, None, MODEL_AXIS),
    "wgu_scale": P(None, None, MODEL_AXIS),
    "wq": P(None, None, MODEL_AXIS),
    "wk": P(None, None, MODEL_AXIS),
    "wv": P(None, None, MODEL_AXIS),
    "wo": P(None, MODEL_AXIS, None),
    "bq": P(None, MODEL_AXIS),
    "bk": P(None, MODEL_AXIS),
    "bv": P(None, MODEL_AXIS),
    "wg": P(None, None, MODEL_AXIS),
    "wu": P(None, None, MODEL_AXIS),
    "wd": P(None, MODEL_AXIS, None),
    "attn_norm": P(),
    "mlp_norm": P(),
    "q_norm": P(),
    "k_norm": P(),
    # Quantization scales follow their weight's output-dim sharding.
    "wq_scale": P(None, None, MODEL_AXIS),
    "wk_scale": P(None, None, MODEL_AXIS),
    "wv_scale": P(None, None, MODEL_AXIS),
    "wo_scale": P(),
    "wg_scale": P(None, None, MODEL_AXIS),
    "wu_scale": P(None, None, MODEL_AXIS),
    "wd_scale": P(),
    # MoE (Llama-4 / Qwen3-MoE): expert dim over the dedicated "expert"
    # axis (weights memory scales 1/ep), FFN dim over "model". With ep > 1
    # the MoE block runs under shard_map (ops/moe.py) which dictates local
    # layouts itself; these are the at-rest shardings.
    "router": P(),
    "we_gate": P(None, EXPERT_AXIS, None, MODEL_AXIS),
    "we_up": P(None, EXPERT_AXIS, None, MODEL_AXIS),
    "we_down": P(None, EXPERT_AXIS, MODEL_AXIS, None),
    # Llama-4 fused experts + always-on shared expert.
    "gate_up": P(None, EXPERT_AXIS, None, MODEL_AXIS),
    "down": P(None, EXPERT_AXIS, MODEL_AXIS, None),
    "shared_wg": P(None, None, MODEL_AXIS),
    "shared_wu": P(None, None, MODEL_AXIS),
    "shared_wd": P(None, MODEL_AXIS, None),
    # Expert quantization scales ([.., E, 1, N]) follow their weight's
    # expert/output-dim sharding; row-parallel (down) scales replicate
    # their channel dim.
    "we_gate_scale": P(None, EXPERT_AXIS, None, MODEL_AXIS),
    "we_up_scale": P(None, EXPERT_AXIS, None, MODEL_AXIS),
    "we_down_scale": P(None, EXPERT_AXIS, None, None),
    "gate_up_scale": P(None, EXPERT_AXIS, None, MODEL_AXIS),
    "down_scale": P(None, EXPERT_AXIS, None, None),
    "shared_wg_scale": P(None, None, MODEL_AXIS),
    "shared_wu_scale": P(None, None, MODEL_AXIS),
    "shared_wd_scale": P(),
}

TOP_PARAM_SPECS = {
    "embed": P(),
    "final_norm": P(),
    "lm_head": P(None, MODEL_AXIS),
    "lm_head_scale": P(None, MODEL_AXIS),
}


def _divisible(spec: P, shape: tuple, tp: int, ep: int = 1) -> P:
    """Drop a mesh-axis annotation on dims its group size doesn't divide
    (e.g. KV heads when num_kv_heads < tp: replicate instead — the standard
    GQA head-replication fallback; likewise experts vs the expert axis)."""
    group = {MODEL_AXIS: tp, EXPERT_AXIS: ep}
    parts = []
    for i, axis in enumerate(spec):
        if axis in group and shape[i] % group[axis] != 0:
            parts.append(None)
        else:
            parts.append(axis)
    return P(*parts)


def _layer_spec(name: str, ndim: int) -> P:
    """Spec for one layer param. LAYER_PARAM_SPECS is written for the
    stacked [L, ...] layout; per-layer dict models (Llama-4, Mllama) hold
    the same tensors without the leading layer axis — drop the leading
    None to match the rank."""
    spec = LAYER_PARAM_SPECS.get(name, P())
    if len(spec) == ndim + 1 and spec[0] is None:
        return P(*spec[1:])
    if len(spec) > ndim:
        return P()
    return spec


def param_specs(params: dict) -> dict:
    specs = {}
    for name, value in params.items():
        if name == "layers":
            if isinstance(value, (list, tuple)):
                # Per-layer dict layout (Llama-4 / Mllama class).
                specs["layers"] = [
                    {k: _layer_spec(k, getattr(v, "ndim", 0))
                     for k, v in lp.items()} for lp in value
                ]
            else:
                specs["layers"] = {
                    k: _layer_spec(k, getattr(v, "ndim", 0))
                    for k, v in value.items()
                }
        elif name == "lora":
            # LoRA stacks are rank-r slivers: replicate (the base matmul's
            # activations stay sharded; XLA inserts the tiny collectives).
            specs["lora"] = jax.tree.map(lambda _: P(), value)
        else:
            specs[name] = TOP_PARAM_SPECS.get(name, P())
    return specs


def _spans_hosts(mesh: Mesh) -> bool:
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _place_global(p, mesh: Mesh, sharding: NamedSharding):
    """Place a host-side array onto a (possibly multi-host) mesh. device_put
    only reaches addressable devices; across hosts each process contributes
    its local shards via make_array_from_callback (every host holds the
    full host-side array here — the lazy per-shard path is
    models/sharded_weights.py)."""
    if not _spans_hosts(mesh):
        return jax.device_put(p, sharding)
    import numpy as np
    arr = np.asarray(p)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_params(params: dict, mesh: Mesh, model=None) -> dict:
    specs = param_specs(params)
    tp = mesh.shape[MODEL_AXIS]
    ep = mesh.shape.get(EXPERT_AXIS, 1)

    def place(p, s):
        if isinstance(p, dict):
            return {k: place(v, s[k]) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return [place(v, si) for v, si in zip(p, s)]
        return _place_global(
            p, mesh, NamedSharding(mesh, _divisible(s, p.shape, tp, ep)))

    return place(params, specs)


def sp_constraint(sp_sharding, num_tokens: int):
    """Residual-stream constraint for sequence parallelism (reference
    semantics: test/tiny/test_sequence_parallel.py:25-58). Returns a
    function applied to [N, H] activations at matmul-segment boundaries;
    GSPMD then converts the Megatron all-reduces into reduce-scatter +
    all-gather pairs and splits norm/elementwise work over the model axis.
    Identity when SP is off or N doesn't divide the group (small decode
    buckets run replicated — negligible activation volume)."""
    if sp_sharding is None:
        return lambda x: x
    n_shards = sp_sharding.mesh.shape[sp_sharding.spec[0]]
    if num_tokens % n_shards != 0:
        return lambda x: x
    return lambda x: jax.lax.with_sharding_constraint(x, sp_sharding)


def sp_sharding_for(mesh: Mesh) -> NamedSharding:
    """The [N, H] token-axis sharding SP constrains the residual stream to."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf fully replicated over the mesh (LoRA stacks, small
    side tensors)."""
    return jax.tree.map(
        lambda p: _place_global(p, mesh, NamedSharding(mesh, P())), tree)


# [L, num_pages, page_size, 2*kv_heads, head_dim]: combined KV heads sharded
# over the model axis (2*Hkv is even, so tp <= 2*Hkv shards cleanly for
# Hkv % (tp/2) == 0; otherwise replicate).
KV_SPEC = P(None, None, None, MODEL_AXIS, None)


def shard_kv_cache(kv_spec, mesh: Mesh):
    """Allocate the paged KV cache sharded over the mesh. kv_spec is the
    executor's KVCacheSpec; FP8 caches get their scales tensor sharded
    identically (minus the head_dim axis)."""
    tp = mesh.shape[MODEL_AXIS]
    shape = kv_spec.shape
    sharding = NamedSharding(mesh, _divisible(KV_SPEC, shape, tp))
    if getattr(kv_spec, "is_fp8", False):
        from vllm_neuron_tpu.ops.ragged_attention import FP8KVCache
        # Per-slot scales [..., ps, SCALE_LANES] carry no head axis —
        # replicate them (identical on every model shard).
        scale_sharding = NamedSharding(mesh, P())
        out_shardings = FP8KVCache(sharding, scale_sharding)
    else:
        out_shardings = sharding
    # allocate_shaped is THE pages(+scales) constructor (executor.py).
    return jax.jit(lambda: kv_spec.allocate_shaped(shape),
                   out_shardings=out_shardings)()
