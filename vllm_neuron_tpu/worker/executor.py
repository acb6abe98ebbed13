# SPDX-License-Identifier: Apache-2.0
"""Device-program executor: owns model params, the paged KV cache, and the
per-bucket jitted programs.

TPU-native equivalent of the reference's compiled-NEFF-per-bucket layer
(NxDI compile/load at vllm_neuron/worker/neuronx_distributed_model_loader.py:
214-241): each (phase, bucket) pair is one XLA program, compiled on first use
and cached both in-process and on disk via the JAX persistent compilation
cache keyed under the engine-config hash (reference analogue: md5-keyed
neuron-compiled-artifacts dir, model_loader.py:180-212).

KV caches are donated through every call, so XLA updates them in place — the
cache never round-trips to host.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_neuron_tpu.config import EngineConfig, resolve_dtype
from vllm_neuron_tpu.ops.attention import DecodeMeta, PrefillMeta
from vllm_neuron_tpu.utils import cdiv, init_logger

logger = init_logger(__name__)


@dataclass(frozen=True)
class KVCacheSpec:
    num_layers: int
    num_blocks: int  # usable blocks (ids 1..num_blocks); block 0 is null
    block_size: int
    num_kv_heads: int
    head_dim: int
    dtype: Any
    max_model_len: int

    @property
    def num_slots(self) -> int:
        return (self.num_blocks + 1) * self.block_size

    @property
    def max_blocks_per_seq(self) -> int:
        return cdiv(self.max_model_len, self.block_size)

    def bytes_total(self) -> int:
        itemsize = jnp.dtype(self.dtype).itemsize
        return (2 * self.num_layers * self.num_slots * self.num_kv_heads *
                self.head_dim * itemsize)


class ModelExecutor:
    """Synchronous single-controller executor. With a multi-device mesh the
    same programs run SPMD via sharding annotations (parallel/sharding.py);
    the host-side control flow is identical (the TPU analogue of the
    reference's world_size==1 driver, neuron_worker.py:106-121)."""

    def __init__(self, model, config: EngineConfig, params: dict,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.kv_spec = KVCacheSpec(
            num_layers=config.model.num_layers,
            num_blocks=config.cache.num_blocks,
            block_size=config.cache.block_size,
            num_kv_heads=config.model.num_kv_heads,
            head_dim=config.model.head_dim,
            dtype=(config.model.dtype
                   if config.cache.kv_cache_dtype in ("auto", None) else
                   resolve_dtype(config.cache.kv_cache_dtype)),
            max_model_len=config.model.max_model_len,
        )
        self._setup_compilation_cache()
        if mesh is not None:
            from vllm_neuron_tpu.parallel.sharding import (shard_kv_cache,
                                                           shard_params)
            params = shard_params(params, mesh, model)
            self.kv_caches = shard_kv_cache(
                self._alloc_kv_host_spec(), mesh)
        else:
            self.kv_caches = self._alloc_kv()
        self.params = params
        self._fns: dict[tuple, Callable] = {}

    def _setup_compilation_cache(self):
        cache_dir = self.config.compiled_artifacts_dir
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "vllm_neuron_tpu",
                "compiled", self.config.config_hash())
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # pragma: no cover
            logger.warning("persistent compile cache unavailable: %s", e)

    def _alloc_kv_host_spec(self):
        s = self.kv_spec
        shape = (s.num_layers, s.num_slots, s.num_kv_heads, s.head_dim)
        return {
            "k": jax.ShapeDtypeStruct(shape, s.dtype),
            "v": jax.ShapeDtypeStruct(shape, s.dtype),
        }

    def _alloc_kv(self) -> dict:
        s = self.kv_spec
        shape = (s.num_layers, s.num_slots, s.num_kv_heads, s.head_dim)
        logger.info(
            "allocating paged KV cache: %s x2, %.2f GiB total", shape,
            self.kv_spec.bytes_total() / 2**30)
        return {
            "k": jnp.zeros(shape, s.dtype),
            "v": jnp.zeros(shape, s.dtype),
        }

    # ------------------------------------------------------------------
    # Program builders (one jitted callable per (phase, static shapes))
    # ------------------------------------------------------------------

    def _get_fn(self, key: tuple, builder: Callable) -> Callable:
        fn = self._fns.get(key)
        if fn is None:
            logger.info("compiling program %s", key)
            fn = builder()
            self._fns[key] = fn
        return fn

    def _build_prefill(self, prefix: bool):
        model = self.model
        block_size = self.kv_spec.block_size
        kind = "prefix_prefill" if prefix else "prefill"

        def fn(params, kv, input_ids, positions, meta, last_idx):
            hidden, kv = model.forward(params, input_ids, positions, kv,
                                       meta, kind=kind,
                                       block_size=block_size)
            # One logits row per prefill sequence (B==1 today).
            h = jax.lax.dynamic_index_in_dim(hidden[0], last_idx, axis=0,
                                             keepdims=True)
            logits = model.compute_logits(params, h)
            return logits, kv

        return jax.jit(fn, donate_argnums=(1,))

    def _build_decode(self):
        model = self.model
        block_size = self.kv_spec.block_size

        def fn(params, kv, input_ids, positions, meta):
            hidden, kv = model.forward(params, input_ids, positions, kv,
                                       meta, kind="decode",
                                       block_size=block_size)
            logits = model.compute_logits(params, hidden[:, 0])
            return logits, kv

        return jax.jit(fn, donate_argnums=(1,))

    # ------------------------------------------------------------------
    # Public stepping API (numpy in / numpy logits out)
    # ------------------------------------------------------------------

    def run_prefill(self, input_ids: np.ndarray, positions: np.ndarray,
                    slot_mapping: np.ndarray, block_tables: np.ndarray,
                    seq_lens: np.ndarray, cached_lens: np.ndarray,
                    last_idx: int) -> np.ndarray:
        """input_ids/positions/slot_mapping: [1, T_bucket]; returns logits
        [1, V] float32 (host)."""
        prefix = bool(cached_lens.max() > 0)
        T = input_ids.shape[1]
        fn = self._get_fn(("prefill", T, prefix),
                          lambda: self._build_prefill(prefix))
        meta = PrefillMeta(
            slot_mapping=jnp.asarray(slot_mapping.reshape(-1)),
            seq_lens=jnp.asarray(seq_lens),
            cached_lens=jnp.asarray(cached_lens),
            block_tables=jnp.asarray(block_tables),
        )
        logits, self.kv_caches = fn(self.params, self.kv_caches,
                                    jnp.asarray(input_ids),
                                    jnp.asarray(positions), meta,
                                    np.int32(last_idx))
        return np.asarray(jax.device_get(logits))

    def run_decode(self, input_ids: np.ndarray, positions: np.ndarray,
                   slot_mapping: np.ndarray, block_tables: np.ndarray,
                   context_lens: np.ndarray) -> np.ndarray:
        """All args row-sliced to the decode bucket B. input_ids: [B];
        returns logits [B, V] float32 (host)."""
        B = input_ids.shape[0]
        fn = self._get_fn(("decode", B), self._build_decode)
        meta = DecodeMeta(
            slot_mapping=jnp.asarray(slot_mapping),
            block_tables=jnp.asarray(block_tables),
            context_lens=jnp.asarray(context_lens),
        )
        logits, self.kv_caches = fn(self.params, self.kv_caches,
                                    jnp.asarray(input_ids)[:, None],
                                    jnp.asarray(positions)[:, None], meta)
        return np.asarray(jax.device_get(logits))

    def warmup(self) -> None:
        """Pre-compile all bucketed programs (reference analogue:
        skip_warmup=False path — every bucket compiled at load)."""
        V = 4  # tiny dummy token id
        for T in self.config.bucketing.context_encoding_buckets:
            ids = np.full((1, T), V, np.int32)
            pos = np.arange(T, dtype=np.int32)[None]
            slots = np.full((1, T), -1, np.int32)
            bt = np.zeros((1, self.kv_spec.max_blocks_per_seq), np.int32)
            self.run_prefill(ids, pos, slots, bt,
                             np.array([1], np.int32),
                             np.array([0], np.int32), 0)
        for B in self.config.bucketing.token_generation_buckets:
            ids = np.zeros(B, np.int32)
            pos = np.zeros(B, np.int32)
            slots = np.full(B, -1, np.int32)
            bt = np.zeros((B, self.kv_spec.max_blocks_per_seq), np.int32)
            ctx = np.zeros(B, np.int32)
            self.run_decode(ids, pos, slots, bt, ctx)

    def memory_stats(self) -> dict:
        """Device memory introspection (reference analogue:
        torch.classes.neuron.Runtime().get_vnc_memory_stats(),
        neuron_worker.py:54-55)."""
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        return stats or {}
