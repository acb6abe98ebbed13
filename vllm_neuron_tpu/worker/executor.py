# SPDX-License-Identifier: Apache-2.0
"""Device-program executor: owns model params, the paged KV cache, and the
bucketed unified-step programs.

TPU-native equivalent of the reference's compiled-NEFF-per-bucket layer
(NxDI compile/load at vllm_neuron/worker/neuronx_distributed_model_loader.py:
214-241) — but where the reference compiles separate context-encoding and
token-generation graphs per bucket, every serving phase here is ONE program
family parameterized only by the padded token count N: the unified ragged
step (ops/ragged_attention.py). Each (N_bucket, return_logits) pair is one
XLA program, compiled on first use and cached on disk via the JAX persistent
compilation cache — content-addressed by HLO hash in one shared store
(reference analogue: md5-keyed neuron-compiled-artifacts dir,
model_loader.py:180-212; see _setup_compilation_cache for why the per-config
namespace was dropped).

The step fuses: embedding -> L decoder layers (KV scatter + ragged paged
attention) -> final norm -> logits for each sequence's last scheduled token
-> on-device sampling. Decode steps therefore ship only [S] sampled token ids
to the host; full [S, V] logits cross only when a request needs the host
sampler (reference analogue: on-device sampling returning token ids,
model_loader.py:350-351, vs the CPU-sampling path).

KV cache: [L, num_pages, page_size, 2*num_kv_heads, head_dim], donated
through every call so XLA updates it in place — it never round-trips.
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
from vllm_neuron_tpu.ops.ragged_attention import RaggedMeta, default_backend
from vllm_neuron_tpu.parallel import multihost
from vllm_neuron_tpu.sampling.ondevice import sample_tokens
from vllm_neuron_tpu.utils import cdiv, init_logger

logger = init_logger(__name__)


@functools.cache
def _packed_h2d() -> bool:
    # Pack the decode window's ~10 small host arrays into ONE [R, N] i32
    # transfer + one jitted unpack. Measured on-chip (round-4 A/B,
    # docs/PERF_NOTES.md): LOSES ~7% e2e sync and is unstable under async
    # decode — the pack's host work + the unpack program cost more than the
    # per-transfer issue overhead saved. Stays opt-in for direct-attached
    # hosts with different transfer economics.
    return os.environ.get("VLLM_TPU_PACKED_H2D") == "1"


def host_gather_bucket(num_host_rows: int, N: int) -> int:
    """Bucket the host-sampled row count H to powers of FOUR (1, 4, 16, ...),
    clamped to the step's token bucket N. The gathered-logits program is
    specialized on H, so coarse buckets bound the variant count at ~log4(N)
    per (N, PP) pair — the extra padded rows cost ~H*V*4 bytes through the
    fetch, negligible next to the 20-55 ms tunnel RTT they ride."""
    H = 1
    while H < num_host_rows:
        H *= 4
    return min(H, N)


def host_gather_buckets(N: int) -> list[int]:
    """All H buckets reachable at token bucket N (for warmup enumeration)."""
    out, H = [], 1
    while H < N:
        out.append(H)
        H *= 4
    out.append(N)
    return out


def _unpack_window(rows, *, K: int):
    """Split the packed [7+K+PP, N] i32 window buffer back into the step
    arrays, entirely on device (one dispatch)."""
    toks = rows[0]
    pos0 = rows[1]
    kv0 = rows[2]
    tk = rows[3]
    temp = jax.lax.bitcast_convert_type(rows[4], jnp.float32)
    tp = jax.lax.bitcast_convert_type(rows[5], jnp.float32)
    ad = rows[6]
    slots = rows[7:7 + K]
    pages = rows[7 + K:].T
    steps = jnp.arange(K, dtype=jnp.int32)[:, None]
    kv_all = jnp.where(kv0[None] > 0, kv0[None] + steps, 0)
    pos_all = pos0[None] + steps
    return toks, pos_all, kv_all, slots, pages, temp, tk, tp, ad


@dataclass(frozen=True)
class KVCacheSpec:
    num_layers: int
    num_blocks: int  # usable pages (ids 1..num_blocks); page 0 is null
    block_size: int
    num_kv_heads: int
    head_dim: int
    dtype: Any
    max_model_len: int

    @property
    def num_pages(self) -> int:
        return self.num_blocks + 1

    @property
    def num_slots(self) -> int:
        return self.num_pages * self.block_size

    @property
    def max_blocks_per_seq(self) -> int:
        return cdiv(self.max_model_len, self.block_size)

    @property
    def shape(self) -> tuple:
        from vllm_neuron_tpu.ops.ragged_attention import padded_head_dim
        return (self.num_layers, self.num_pages, self.block_size,
                2 * self.num_kv_heads, padded_head_dim(self.head_dim))

    @property
    def is_fp8(self) -> bool:
        return jnp.dtype(self.dtype).itemsize == 1

    def bytes_total(self) -> int:
        n = int(np.prod(self.shape)) * jnp.dtype(self.dtype).itemsize
        if self.is_fp8:  # per-slot bf16 scales, lane-replicated (x128)
            from vllm_neuron_tpu.ops.ragged_attention import SCALE_LANES
            n += int(np.prod(self.shape[:-2])) * SCALE_LANES * 2
        return n

    def allocate(self):
        """Zero-filled cache in this spec's layout (FP8 gets the scaled
        container; see ops/ragged_attention.FP8KVCache)."""
        return self.allocate_shaped(self.shape)

    def allocate_shaped(self, shape: tuple):
        """Zero cache of an explicit shape in this spec's dtype layout —
        THE single constructor for main/draft/sharded caches (one place
        owns the pages+scales pairing)."""
        if self.is_fp8:
            from vllm_neuron_tpu.ops.ragged_attention import (FP8KVCache,
                                                              SCALE_LANES)
            return FP8KVCache(
                jnp.zeros(shape, self.dtype),
                jnp.zeros(shape[:-2] + (SCALE_LANES,), jnp.bfloat16))
        return jnp.zeros(shape, self.dtype)


class ModelExecutor:
    """Synchronous single-controller executor. With a multi-device mesh the
    same programs run SPMD via sharding annotations (parallel/sharding.py);
    the host-side control flow is identical (the TPU analogue of the
    reference's world_size==1 driver, neuron_worker.py:106-121)."""

    def __init__(self, model, config: EngineConfig, params: dict,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 presharded: bool = False):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.kv_spec = KVCacheSpec(
            # Models may compact paged KV to a subset of layers (Mllama's
            # cross-attention layers hold no paged K/V).
            num_layers=getattr(model, "num_kv_layers",
                               config.model.num_layers),
            num_blocks=config.cache.num_blocks,
            block_size=config.cache.block_size,
            num_kv_heads=config.model.num_kv_heads,
            head_dim=config.model.head_dim,
            dtype=(config.model.dtype
                   if config.cache.kv_cache_dtype in ("auto", None) else
                   resolve_dtype(config.cache.kv_cache_dtype)),
            max_model_len=config.model.max_model_len,
        )
        # Pallas custom calls cannot be auto-partitioned by GSPMD; the ops
        # layer shard_maps the in-repo decode kernel over the registered
        # mesh (heads split over "model"), and falls back to the dense XLA
        # paths where the head layout doesn't split.
        from vllm_neuron_tpu.ops.ragged_attention import set_attention_mesh
        set_attention_mesh(mesh)
        self.attn_backend = default_backend()
        if config.quant.w8a8_min_rows:
            # The ops layer reads the threshold once per process (env-
            # transported so ops stay config-free); engine init pins it.
            from vllm_neuron_tpu.ops import quant as _q
            os.environ["VLLM_TPU_W8A8_MIN_ROWS"] = str(
                config.quant.w8a8_min_rows)
            _q._w8a8_min_rows.cache_clear()
        self._setup_compilation_cache()
        if mesh is not None:
            from vllm_neuron_tpu.parallel.sharding import (shard_kv_cache,
                                                           shard_params)
            if not presharded:
                params = shard_params(params, mesh, model)
            self.kv_pages = shard_kv_cache(self.kv_spec, mesh)
        else:
            logger.info("allocating paged KV cache: %s, %.2f GiB",
                        self.kv_spec.shape,
                        self.kv_spec.bytes_total() / 2**30)
            self.kv_pages = self.kv_spec.allocate()
        self.params = params
        self._fns: dict[tuple, Callable] = {}
        self._step_counter = 0
        # Multi-host lockstep (parallel/multihost.py): when serving spans
        # hosts, the leader broadcasts every program dispatch so followers
        # replay the identical SPMD call sequence. carry_last holds this
        # host's device-resident last-window tokens for CARRY_LAST bundles.
        self._replicate_steps = multihost.num_hosts() > 1
        self.carry_last: Optional[jax.Array] = None
        # Eagle fused speculation state (reference analogue: the fused
        # draft+target NEFF, model_loader.py:243-303): the draft model, its
        # own paged KV cache (same page geometry/table as the target), and
        # the per-row target feature of the last accepted token.
        self.draft_model = None
        self.draft_params = None
        self.kv_draft = None
        self.spec_hidden = None
        # Cross-attention (encoder) KV for gated-cross multimodal families
        # (Mllama): per-engine-row cached K/V over the projected vision
        # states, the TPU analogue of vLLM's encoder KV blocks.
        self.cross_kv = None
        self.cross_valid = None
        self.cross_t = 0

    def _alloc(self, shape, dtype, spec=None):
        """Device buffer allocation that respects the mesh (DP engine lanes
        pin params to their own device slice; a bare jnp.zeros would land
        on the process default device and break colocation)."""
        if self.mesh is None:
            return jnp.zeros(shape, dtype)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS
        from vllm_neuron_tpu.parallel.sharding import _divisible
        tp = self.mesh.shape.get(MODEL_AXIS, 1)
        spec = spec if spec is not None else P(*([None] * len(shape)))
        sharding = NamedSharding(self.mesh, _divisible(spec, shape, tp))
        return jax.jit(lambda: jnp.zeros(shape, dtype),
                       out_shardings=sharding)()

    def init_cross_attention(self, t_img: int) -> None:
        """Allocate the cross-KV row cache: [n_cross, max_num_seqs, t_img,
        2*nKV, D] in the model dtype + a per-row validity mask. Heads shard
        over the model axis when divisible (same layout rule as the paged
        cache)."""
        from jax.sharding import PartitionSpec as P
        from vllm_neuron_tpu.parallel.mesh import MODEL_AXIS
        model = self.model
        n_cross = len(model.cross_layers)
        R = self.config.scheduler.max_num_seqs
        shape = (n_cross, R, t_img, 2 * model.num_kv_heads, model.head_dim)
        self.cross_t = t_img
        self.cross_kv = self._alloc(shape, self.config.model.dtype,
                                    P(None, None, None, MODEL_AXIS, None))
        self.cross_valid = self._alloc((R, t_img), jnp.bool_)
        logger.info("cross-attention KV cache: %s, %.2f GiB", shape,
                    int(np.prod(shape)) *
                    jnp.dtype(self.config.model.dtype).itemsize / 2**30)

    def set_cross_row(self, row: int, cross_states: np.ndarray,
                      n_valid: int) -> None:
        """Project + cache one row's cross K/V from vision states (padded
        to [cross_t, H]); the first n_valid tokens become visible."""
        self._replicate("set_cross_row", dict(
            row=row, cross_states=cross_states, n_valid=n_valid))
        fn = self._get_fn(("cross_set",), self._build_cross_set)
        self.cross_kv, self.cross_valid = fn(
            self.params, self.cross_kv, self.cross_valid,
            jnp.asarray(cross_states), jnp.asarray(row, jnp.int32),
            jnp.asarray(n_valid, jnp.int32))

    def clear_cross_row(self, row: int) -> None:
        """Mark a row imageless (rows are reused across requests; a stale
        valid mask would hand the next occupant the previous image)."""
        self._replicate("clear_cross_row", dict(row=row))
        fn = self._get_fn(("cross_clear",), self._build_cross_clear)
        self.cross_valid = fn(self.cross_valid,
                              jnp.asarray(row, jnp.int32))

    def _build_cross_set(self):
        model = self.model
        T = self.cross_t

        def fn(params, ckv, cvalid, states, row, n_valid):
            kv = model.compute_cross_kv(params,
                                        states.astype(model.dtype))
            ckv = ckv.at[:, row].set(kv.astype(ckv.dtype))
            cvalid = cvalid.at[row].set(
                jnp.arange(T, dtype=jnp.int32) < n_valid)
            return ckv, cvalid

        return jax.jit(fn, donate_argnums=(1, 2))

    def _build_cross_clear(self):
        return jax.jit(
            lambda cvalid, row: cvalid.at[row].set(False),
            donate_argnums=(0,))

    def init_speculation(self, draft_model, draft_params) -> None:
        self.draft_model = draft_model
        self.draft_params = draft_params
        from vllm_neuron_tpu.ops.ragged_attention import padded_head_dim
        shape = (draft_model.num_layers, self.kv_spec.num_pages,
                 self.kv_spec.block_size, 2 * draft_model.num_kv_heads,
                 padded_head_dim(draft_model.head_dim))
        self.kv_draft = self.kv_spec.allocate_shaped(shape)
        self.spec_hidden = jnp.zeros(
            (self.config.scheduler.max_num_seqs,
             self.model.hidden_size), self.config.model.dtype)

    def _setup_compilation_cache(self):
        cache_dir = self.config.compiled_artifacts_dir
        if cache_dir is None:
            # ONE shared store, unlike the reference's md5(config)-keyed
            # artifact dirs (model_loader.py:180-212): JAX's persistent
            # cache is content-addressed by HLO+flags hash internally, so
            # a per-config namespace only manufactures misses when a
            # config knob changes without changing any program (measured:
            # a scheduler-policy field addition recompiled every 8B
            # program, minutes each through the compile service).
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "vllm_neuron_tpu",
                "compiled")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception as e:  # pragma: no cover
            logger.warning("persistent compile cache unavailable: %s", e)

    # ------------------------------------------------------------------
    # Program builder
    # ------------------------------------------------------------------

    def _build_step(self, kind: str, return_logits: bool, mm: bool = False,
                    cross: bool = False, gather_rows: bool = False):
        model = self.model
        attn_backend = self.attn_backend

        def fn(params, kv_pages, token_ids, positions, meta, logits_indices,
               temperature, top_k, top_p, step_seed, *mm_args):
            if gather_rows:
                # Leading extra: [H] row indices whose logits the host
                # needs (mixed host/device sampling). Gathering ON DEVICE
                # before the fetch ships [H, V] instead of [S, V] — at
                # V=128k, b32 the difference is ~16 MB/step through a
                # tunnel whose round trip already costs 20-55 ms
                # (VERDICT r2 weak #5).
                logits_rows, mm_args = mm_args[0], mm_args[1:]
            kwargs = {}
            if cross:
                # Trailing 3 extras: cross KV cache, valid mask, row map.
                kwargs["cross_cache"] = mm_args[-3:-1]
                kwargs["cross_rows"] = mm_args[-1]
                mm_args = mm_args[:-3]
            if mm:
                kwargs["embeds_override"] = mm_args
            hidden, kv_pages = model.forward(params, token_ids, positions,
                                             kv_pages, meta, kind=kind,
                                             attn_backend=attn_backend,
                                             **kwargs)
            sel = hidden[logits_indices]  # [S, H]
            logits = model.compute_logits(params, sel)  # [S, V] f32
            key = jax.random.PRNGKey(step_seed)
            tokens = sample_tokens(logits, temperature, top_k, top_p, key)
            if return_logits:
                if gather_rows:
                    return tokens, logits[logits_rows], kv_pages
                return tokens, logits, kv_pages
            return tokens, kv_pages

        return jax.jit(fn, donate_argnums=(1,))

    def dispatch_decode_window(self, first_tokens, positions0: np.ndarray,
                               slot_table: np.ndarray, kv_lens0: np.ndarray,
                               page_indices: np.ndarray, num_seqs: int,
                               temperature: np.ndarray, top_k: np.ndarray,
                               top_p: np.ndarray,
                               adapter_ids: Optional[np.ndarray] = None,
                               cross_rows: Optional[np.ndarray] = None
                               ) -> dict:
        """Enqueue K pipelined decode steps with device-resident token
        feedback (each step's sampled tokens feed the next WITHOUT visiting
        the host). Returns a handle with device arrays; fetch with
        ``fetch_decode_window``. ``first_tokens`` may be a host array or a
        device array carried from a previous window's last step (optimistic
        cross-window chaining).

        positions0/kv_lens0: [N]; slot_table: [K, N] (-1 skips the KV
        write); page_indices: [N, PP].
        """
        self._replicate("dispatch_decode_window", dict(
            first_tokens=first_tokens, positions0=positions0,
            slot_table=slot_table, kv_lens0=kv_lens0,
            page_indices=page_indices, num_seqs=num_seqs,
            temperature=temperature, top_k=top_k, top_p=top_p,
            adapter_ids=adapter_ids, cross_rows=cross_rows))
        K, N = slot_table.shape
        cross = cross_rows is not None and self.cross_kv is not None
        # Same key format as run_step: the window's per-step program IS the
        # plain decode step (same builder, same traced shapes), so window
        # and single-step dispatch share one compiled program.
        key = ("step", "decode", N, page_indices.shape, False, False, cross,
               None)
        fn = self._get_fn(
            key, lambda: self._build_step("decode", False, cross=cross))
        if _packed_h2d():
            # ONE host->device transfer for the whole window: every small
            # int/float row is packed into a single [R, N] i32 buffer and
            # unpacked by one jitted device program (the axon tunnel
            # charges per transfer; PERF_NOTES "h2d small-array
            # transfers"). Token carry (device array, async chaining)
            # bypasses the pack.
            PP = page_indices.shape[1]
            rows = np.empty((7 + K + PP, N), np.int32)
            rows[0] = (first_tokens if isinstance(first_tokens, np.ndarray)
                       else 0)
            rows[1] = positions0
            rows[2] = kv_lens0
            rows[3] = top_k
            rows[4] = temperature.view(np.int32)
            rows[5] = top_p.view(np.int32)
            rows[6] = adapter_ids if adapter_ids is not None else 0
            rows[7:7 + K] = slot_table
            rows[7 + K:] = page_indices.T
            unpack = self._get_fn(
                ("unpack_window", K, N, PP),
                lambda: jax.jit(_unpack_window, static_argnames=("K",)))
            (toks_p, positions_all, kv_lens_all, slot_dev, pi, temp, tk,
             tp, ad_p) = unpack(jnp.asarray(rows), K=K)
            toks = (toks_p if isinstance(first_tokens, np.ndarray)
                    else first_tokens)
            ad = ad_p if adapter_ids is not None else None
        else:
            # Per-array transfers (direct-attached hosts: issue cost is
            # negligible and skipping the unpack program wins).
            active = kv_lens0 > 0
            kv_lens_all = jnp.asarray(
                np.where(active[None], kv_lens0[None] +
                         np.arange(K, dtype=np.int32)[:, None], 0))
            positions_all = jnp.asarray(
                positions0[None] + np.arange(K, dtype=np.int32)[:, None])
            slot_dev = jnp.asarray(slot_table)
            pi = jnp.asarray(page_indices)
            temp = jnp.asarray(temperature)
            tk = jnp.asarray(top_k)
            tp = jnp.asarray(top_p)
            toks = jnp.asarray(first_tokens)
            ad = (jnp.asarray(adapter_ids) if adapter_ids is not None
                  else None)
        cu = jnp.arange(N + 1, dtype=jnp.int32)
        li = jnp.arange(N, dtype=jnp.int32)
        ns = jnp.asarray([num_seqs], jnp.int32)
        extra = ()
        if cross:
            extra = (self.cross_kv, self.cross_valid,
                     jnp.asarray(cross_rows))
        outs = []
        for k in range(K):
            meta = RaggedMeta(slot_mapping=slot_dev[k],
                              kv_lens=kv_lens_all[k], page_indices=pi,
                              cu_q_lens=cu, num_seqs=ns, adapter_ids=ad)
            self._step_counter += 1
            seed = np.uint32((self.config.model.seed + self._step_counter)
                             & 0xFFFFFFFF)
            toks, self.kv_pages = fn(self.params, self.kv_pages, toks,
                                     positions_all[k], meta, li, temp, tk,
                                     tp, seed, *extra)
            outs.append(toks)
        self.carry_last = toks
        # Stack on device; fetching K arrays separately would be K trips.
        return {"tokens": jnp.stack(outs), "last": toks}

    def fetch_decode_window(self, handle: dict) -> np.ndarray:
        """Block for a dispatched window; returns sampled tokens [K, N]."""
        return np.asarray(jax.device_get(handle["tokens"]))

    def run_decode_window(self, first_tokens: np.ndarray,
                          positions0: np.ndarray, slot_table: np.ndarray,
                          kv_lens0: np.ndarray, page_indices: np.ndarray,
                          num_seqs: int, temperature: np.ndarray,
                          top_k: np.ndarray, top_p: np.ndarray) -> np.ndarray:
        return self.fetch_decode_window(self.dispatch_decode_window(
            first_tokens, positions0, slot_table, kv_lens0, page_indices,
            num_seqs, temperature, top_k, top_p))

    def _get_fn(self, key: tuple, builder: Callable) -> Callable:
        fn = self._fns.get(key)
        if fn is None:
            logger.info("compiling program %s", key)
            # Re-register this executor's mesh: the ops layer reads it at
            # trace time and another engine in the same process may have
            # registered its own since our __init__.
            from vllm_neuron_tpu.ops.ragged_attention import (
                set_attention_mesh)
            set_attention_mesh(self.mesh)
            fn = builder()
            self._fns[key] = fn
        return fn

    def _replicate(self, op: str, kwargs: dict) -> None:
        """Leader-side: broadcast one dispatch bundle to follower hosts
        (no-op on a single host / on followers). Device-array values are
        replaced with the CARRY_LAST sentinel — each host substitutes its
        own shard of the same logical value."""
        if not (self._replicate_steps and multihost.is_leader()):
            return
        wire = {
            k: (multihost.CARRY_LAST if isinstance(v, jax.Array) else v)
            for k, v in kwargs.items()
        }
        multihost.broadcast_step({"op": op, "kwargs": wire})

    # ------------------------------------------------------------------
    # Eagle fused speculation programs
    # ------------------------------------------------------------------

    def _build_prefill_spec(self):
        """Prefill + draft prefill + feature seed, one program: the target
        encodes the prompt and samples; the draft encodes its shifted
        (token_{i+1}, feature_i) stream so its KV is ready for drafting."""
        model = self.model
        draft = self.draft_model
        attn_backend = self.attn_backend

        def fn(params, dparams, kv, kv_d, spec_hidden, token_ids, positions,
               meta, meta_d, row_id, last_idx, temperature, top_k, top_p,
               step_seed):
            hidden, kv = model.forward(params, token_ids, positions, kv,
                                       meta, kind="prefill",
                                       attn_backend=attn_backend)
            sel = hidden[last_idx]  # [1, H]
            logits = model.compute_logits(params, sel)
            key = jax.random.PRNGKey(step_seed)
            tokens = sample_tokens(logits, temperature, top_k, top_p, key)
            # Draft stream: token_{i+1} paired with feature_i, i < T-1.
            dr_tokens = jnp.roll(token_ids, -1)
            embed_fn = lambda t: params["embed"][t]  # noqa: E731
            dpos = jnp.maximum(positions, 0)
            _, kv_d = draft.forward(dparams, embed_fn, dr_tokens, hidden,
                                    dpos, kv_d, meta_d, kind="prefill",
                                    attn_backend=attn_backend)
            spec_hidden = spec_hidden.at[row_id].set(
                sel.astype(spec_hidden.dtype))
            return tokens, spec_hidden, kv, kv_d

        return jax.jit(fn, donate_argnums=(2, 3, 4))

    def _build_spec_decode(self, K: int, lora: bool = False):
        """One fused speculation round: draft K tokens autoregressively,
        verify all K+1 positions with one target pass, accept via
        rejection sampling (greedy rows degenerate to exact prefix match),
        refresh the per-row feature — all on device (reference: Eagle fused
        spec + dynamic sampling simultaneously, README.md:93)."""
        model = self.model
        draft = self.draft_model
        attn_backend = self.attn_backend
        from vllm_neuron_tpu.sampling.spec import (filtered_probs,
                                                   sample_from_probs,
                                                   spec_acceptance)

        def fn(params, dparams, kv, kv_d, spec_hidden, row_ids, first_tokens,
               positions0, slot_table, dslot_table, kv_lens0, page_indices,
               num_seqs, temperature, top_k, top_p, step_seed,
               adapter_ids=None):
            N = first_tokens.shape[0]
            embed_fn = lambda t: params["embed"][t]  # noqa: E731
            active = kv_lens0 > 0
            key = jax.random.PRNGKey(step_seed)

            # --- draft K tokens (N parallel rows, K sequential steps) ---
            feats = spec_hidden[row_ids].astype(model.dtype)  # [N, H]
            tok = first_tokens
            drafted = []
            q_list = []
            cu1 = jnp.arange(N + 1, dtype=jnp.int32)
            for j in range(K):
                # Draft position at step j is (target position - 1) + j; its
                # post-write context length is kv_lens0 - 1 + j.
                meta_d = RaggedMeta(
                    slot_mapping=dslot_table[j],
                    kv_lens=jnp.where(active, kv_lens0 - 1 + j, 0),
                    page_indices=page_indices,
                    cu_q_lens=cu1,
                    num_seqs=num_seqs,
                )
                feats, kv_d = draft.forward(
                    dparams, embed_fn, tok, feats, positions0 - 1 + j,
                    kv_d, meta_d, kind="decode", attn_backend=attn_backend)
                dlogits = jnp.dot(feats.astype(model.dtype),
                                  params["lm_head"],
                                  preferred_element_type=jnp.float32)
                q = filtered_probs(dlogits, temperature, top_k, top_p)
                tok = sample_from_probs(q, jax.random.fold_in(key, j))
                # Greedy rows: exact argmax (q is its one-hot).
                tok = jnp.where(temperature <= 0,
                                jnp.argmax(dlogits, axis=-1).astype(
                                    jnp.int32), tok)
                drafted.append(tok)
                q_list.append(q)
            drafted = jnp.stack(drafted, axis=1)  # [N, K]
            q_probs = jnp.stack(q_list, axis=1)   # [N, K, V]

            # --- target verify: q_len = K+1 per row ------------------------
            T = K + 1
            ver_tokens = jnp.concatenate(
                [first_tokens[:, None], drafted], axis=1)  # [N, K+1]
            ver_flat = ver_tokens.reshape(N * T)
            pos_flat = (positions0[:, None] +
                        jnp.arange(T, dtype=jnp.int32)[None]).reshape(-1)
            meta_v = RaggedMeta(
                slot_mapping=slot_table.reshape(-1),  # [N, T] -> row-major
                kv_lens=jnp.where(active, kv_lens0 + K, 0),
                page_indices=page_indices,
                cu_q_lens=jnp.arange(N + 1, dtype=jnp.int32) * T,
                num_seqs=num_seqs,
                # LoRA rides the target verify only; the Eagle draft has
                # no adapters (lower acceptance, never wrong tokens).
                adapter_ids=(jnp.repeat(adapter_ids, T)
                             if lora else None),
            )
            hidden, kv = model.forward(params, ver_flat, pos_flat, kv, meta_v,
                                       kind="spec_verify",
                                       attn_backend=attn_backend)
            logits = model.compute_logits(params, hidden)  # [N*T, V]

            # --- acceptance: rejection sampling over the verified grid ----
            p_probs = filtered_probs(
                logits,
                jnp.repeat(temperature, T), jnp.repeat(top_k, T),
                jnp.repeat(top_p, T)).reshape(N, T, -1)
            tokens_out = spec_acceptance(drafted, q_probs, p_probs,
                                         jax.random.fold_in(key, K))
            m = jnp.sum((tokens_out >= 0).astype(jnp.int32), axis=1)

            # --- feature refresh: hidden at last accepted position ---------
            hidden = hidden.reshape(N, T, -1)
            last_feat = jnp.take_along_axis(
                hidden, (m - 1)[:, None, None], axis=1)[:, 0]  # [N, H]
            # Padded batch rows share row_id 0 with a possibly-REAL row;
            # duplicate-index scatters are order-undefined and the stale
            # padding write can win, freezing row 0's draft features for
            # the request's lifetime (acceptance silently collapses).
            # Inactive rows scatter to a dropped out-of-bounds index
            # instead.
            safe_rows = jnp.where(active, row_ids, spec_hidden.shape[0])
            spec_hidden = spec_hidden.at[safe_rows].set(
                last_feat.astype(spec_hidden.dtype), mode="drop")
            return tokens_out, spec_hidden, kv, kv_d

        return jax.jit(fn, donate_argnums=(2, 3, 4))

    def _build_spec_decode_multi(self, K: int, W: int, lora: bool = False):
        """W fused speculation rounds in ONE program (lax.scan over rounds)
        with DEVICE-RESIDENT acceptance state: each round's positions,
        kv lens, and KV slot mappings derive from the previous round's
        acceptance count, so the host pays one round trip per W rounds
        instead of per round — the RTT amortization plain decode windows
        already have (docs/PERF_NOTES.md "speculation on the TPU": one
        20-55 ms RTT per ~1.65 tokens was the structural loss). Round
        internals mirror _build_spec_decode; slot tables are computed
        in-program from the page table instead of arriving from the host.
        Returns accepted tokens [N, W, K+1] (-1 past each round's
        acceptance); rejected rounds' stale KV entries sit beyond kv_len
        and are overwritten by the next round's verify."""
        model = self.model
        draft = self.draft_model
        attn_backend = self.attn_backend
        ps = self.config.cache.block_size
        from vllm_neuron_tpu.sampling.spec import (filtered_probs,
                                                   sample_from_probs,
                                                   spec_acceptance)

        def fn(params, dparams, kv, kv_d, spec_hidden, row_ids, first_tokens,
               positions0, slot_caps, kv_lens0, page_indices, num_seqs,
               temperature, top_k, top_p, step_seed, adapter_ids=None):
            N = first_tokens.shape[0]
            T = K + 1
            PP = page_indices.shape[1]
            embed_fn = lambda t: params["embed"][t]  # noqa: E731
            active = kv_lens0 > 0
            base_key = jax.random.PRNGKey(step_seed)
            feats0 = spec_hidden[row_ids].astype(model.dtype)  # [N, H]

            def slots_for(pos):
                # pos: [N] absolute token positions -> KV slots; -1 (write
                # skipped / dead row) when beyond the row's reserved blocks
                # OR beyond the dispatch's page bucket (the clip would
                # otherwise redirect the write into the LAST listed page,
                # overwriting live context KV — the host sizes PP for the
                # full W-round window, this guard is the backstop).
                blk = jnp.clip(pos // ps, 0, PP - 1)
                s = jnp.take_along_axis(page_indices, blk[:, None],
                                        axis=1)[:, 0] * ps + pos % ps
                ok = (active & (pos >= 0) & (pos < slot_caps)
                      & (pos // ps < PP))
                return jnp.where(ok, s, -1)

            def round_body(carry, r):
                tok, pos0, feats, kv, kv_d = carry
                key = jax.random.fold_in(base_key, r)
                kv_lens = jnp.where(active, pos0 + 1, 0)
                cu1 = jnp.arange(N + 1, dtype=jnp.int32)
                drafted, q_list = [], []
                ftok = tok
                for j in range(K):
                    meta_d = RaggedMeta(
                        slot_mapping=slots_for(pos0 - 1 + j),
                        kv_lens=jnp.where(active, kv_lens - 1 + j, 0),
                        page_indices=page_indices,
                        cu_q_lens=cu1,
                        num_seqs=num_seqs,
                    )
                    feats, kv_d = draft.forward(
                        dparams, embed_fn, ftok, feats, pos0 - 1 + j,
                        kv_d, meta_d, kind="decode",
                        attn_backend=attn_backend)
                    dlogits = jnp.dot(feats.astype(model.dtype),
                                      params["lm_head"],
                                      preferred_element_type=jnp.float32)
                    q = filtered_probs(dlogits, temperature, top_k, top_p)
                    ftok = sample_from_probs(q, jax.random.fold_in(key, j))
                    ftok = jnp.where(temperature <= 0,
                                     jnp.argmax(dlogits, axis=-1).astype(
                                         jnp.int32), ftok)
                    drafted.append(ftok)
                    q_list.append(q)
                drafted = jnp.stack(drafted, axis=1)  # [N, K]
                q_probs = jnp.stack(q_list, axis=1)   # [N, K, V]

                ver_tokens = jnp.concatenate([tok[:, None], drafted],
                                             axis=1)  # [N, T]
                pos_grid = (pos0[:, None]
                            + jnp.arange(T, dtype=jnp.int32)[None])
                slot_grid = jax.vmap(slots_for, in_axes=1,
                                     out_axes=1)(pos_grid)  # [N, T]
                meta_v = RaggedMeta(
                    slot_mapping=slot_grid.reshape(-1),
                    kv_lens=jnp.where(active, kv_lens + K, 0),
                    page_indices=page_indices,
                    cu_q_lens=jnp.arange(N + 1, dtype=jnp.int32) * T,
                    num_seqs=num_seqs,
                    adapter_ids=(jnp.repeat(adapter_ids, T)
                                 if lora else None),
                )
                hidden, kv = model.forward(
                    params, ver_tokens.reshape(N * T),
                    pos_grid.reshape(-1), kv, meta_v, kind="spec_verify",
                    attn_backend=attn_backend)
                logits = model.compute_logits(params, hidden)  # [N*T, V]
                p_probs = filtered_probs(
                    logits, jnp.repeat(temperature, T),
                    jnp.repeat(top_k, T),
                    jnp.repeat(top_p, T)).reshape(N, T, -1)
                tokens_out = spec_acceptance(
                    drafted, q_probs, p_probs, jax.random.fold_in(key, K))
                m = jnp.sum((tokens_out >= 0).astype(jnp.int32), axis=1)
                m = jnp.where(active, jnp.maximum(m, 1), 0)

                hidden = hidden.reshape(N, T, -1)
                last_feat = jnp.take_along_axis(
                    hidden, jnp.maximum(m - 1, 0)[:, None, None],
                    axis=1)[:, 0]
                next_tok = jnp.take_along_axis(
                    tokens_out, jnp.maximum(m - 1, 0)[:, None],
                    axis=1)[:, 0]
                tok = jnp.where(active, next_tok, tok)
                feats = jnp.where(active[:, None], last_feat, feats)
                return (tok, pos0 + m, feats, kv, kv_d), tokens_out

            (tok, pos0, feats, kv, kv_d), rounds_out = jax.lax.scan(
                round_body, (first_tokens, positions0, feats0, kv, kv_d),
                jnp.arange(W, dtype=jnp.int32))
            # Dropped-index scatter for padded rows (see the single-round
            # program: duplicate row_id 0 writes are order-undefined).
            safe_rows = jnp.where(active, row_ids, spec_hidden.shape[0])
            spec_hidden = spec_hidden.at[safe_rows].set(
                feats.astype(spec_hidden.dtype), mode="drop")
            # [W, N, T] -> [N, W, T] for per-request round processing.
            return (jnp.transpose(rounds_out, (1, 0, 2)), spec_hidden,
                    kv, kv_d)

        return jax.jit(fn, donate_argnums=(2, 3, 4))

    def run_spec_decode_multi(self, row_ids, first_tokens, positions0,
                              slot_caps, kv_lens0, page_indices,
                              num_seqs: int, K: int, W: int,
                              temperature=None, top_k=None, top_p=None,
                              adapter_ids=None) -> np.ndarray:
        """W fused speculation rounds, one host round trip. slot_caps: [N]
        int32 block-capacity (in slots) per row. Returns accepted tokens
        [N, W, K+1] (-1 past each round's acceptance)."""
        N = first_tokens.shape[0]
        if temperature is None:
            temperature = np.zeros(N, np.float32)
        if top_k is None:
            top_k = np.full(N, -1, np.int32)
        if top_p is None:
            top_p = np.ones(N, np.float32)
        self._replicate("run_spec_decode_multi", dict(
            row_ids=row_ids, first_tokens=first_tokens,
            positions0=positions0, slot_caps=slot_caps, kv_lens0=kv_lens0,
            page_indices=page_indices, num_seqs=num_seqs, K=K, W=W,
            temperature=temperature, top_k=top_k, top_p=top_p,
            adapter_ids=adapter_ids))
        lora = adapter_ids is not None
        key = ("spec_decode_multi", K, W, N, page_indices.shape, lora)
        fn = self._get_fn(key,
                          lambda: self._build_spec_decode_multi(K, W, lora))
        self._step_counter += 1
        seed = np.uint32((self.config.model.seed + self._step_counter)
                         & 0xFFFFFFFF)
        extra = (jnp.asarray(adapter_ids),) if lora else ()
        tokens, self.spec_hidden, self.kv_pages, self.kv_draft = fn(
            self.params, self.draft_params, self.kv_pages, self.kv_draft,
            self.spec_hidden, jnp.asarray(row_ids),
            jnp.asarray(first_tokens), jnp.asarray(positions0),
            jnp.asarray(slot_caps), jnp.asarray(kv_lens0),
            jnp.asarray(page_indices),
            jnp.asarray([num_seqs], jnp.int32), jnp.asarray(temperature),
            jnp.asarray(top_k), jnp.asarray(top_p), seed, *extra)
        return np.asarray(jax.device_get(tokens))

    def run_prefill_spec(self, token_ids, positions, slot_mapping, kv_len,
                         page_indices, num_new, row, temperature, top_k,
                         top_p, keep_device: bool = False,
                         adapter_ids=None) -> np.ndarray:
        self._replicate("run_prefill_spec", dict(
            token_ids=token_ids, positions=positions,
            slot_mapping=slot_mapping, kv_len=kv_len,
            page_indices=page_indices, num_new=num_new, row=row,
            temperature=temperature, top_k=top_k, top_p=top_p,
            keep_device=True, adapter_ids=adapter_ids))
        N = token_ids.shape[0]
        key = ("prefill_spec", N, page_indices.shape,
               adapter_ids is not None)
        fn = self._get_fn(key, self._build_prefill_spec)
        meta = RaggedMeta(
            slot_mapping=jnp.asarray(slot_mapping),
            kv_lens=jnp.asarray([kv_len], jnp.int32),
            page_indices=jnp.asarray(page_indices),
            cu_q_lens=jnp.asarray([0, num_new], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
            # LoRA rides the target meta only: the Eagle draft has no
            # adapters (verification stays authoritative either way).
            adapter_ids=(jnp.asarray(adapter_ids)
                         if adapter_ids is not None else None),
        )
        # Draft stream is one position shorter; draft position i shares
        # target position i's slot (same block table, separate cache buffer).
        # With a prefix-cache hit the window starts at nct = kv_len - num_new
        # and the draft's context spans 0..kv_len-2: cached blocks already
        # hold draft KV for positions < nct (written when first filled).
        dslots = np.asarray(slot_mapping).copy()
        dslots[max(num_new - 1, 0):] = -1
        meta_d = RaggedMeta(
            slot_mapping=jnp.asarray(dslots),
            kv_lens=jnp.asarray([max(kv_len - 1, 0)], jnp.int32),
            page_indices=meta.page_indices,
            cu_q_lens=jnp.asarray([0, max(num_new - 1, 0)], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
        )
        self._step_counter += 1
        seed = np.uint32((self.config.model.seed + self._step_counter)
                         & 0xFFFFFFFF)
        tokens, self.spec_hidden, self.kv_pages, self.kv_draft = fn(
            self.params, self.draft_params, self.kv_pages, self.kv_draft,
            self.spec_hidden, jnp.asarray(token_ids), jnp.asarray(positions),
            meta, meta_d, jnp.asarray([row], jnp.int32),
            jnp.asarray([num_new - 1], jnp.int32), jnp.asarray(temperature),
            jnp.asarray(top_k), jnp.asarray(top_p), seed)
        if keep_device:
            return tokens
        return np.asarray(jax.device_get(tokens))

    def run_spec_decode(self, row_ids, first_tokens, positions0, slot_table,
                        dslot_table, kv_lens0, page_indices, num_seqs: int,
                        temperature=None, top_k=None, top_p=None,
                        adapter_ids=None) -> np.ndarray:
        """One fused speculation round. slot_table: [K+1, N] target slots;
        dslot_table: [K, N] draft slots; temperature/top_k/top_p: [N]
        per-row sampling params (None => greedy). Returns accepted tokens
        [N, K+1] (-1 past each row's acceptance)."""
        N = first_tokens.shape[0]
        if temperature is None:
            temperature = np.zeros(N, np.float32)
        if top_k is None:
            top_k = np.full(N, -1, np.int32)
        if top_p is None:
            top_p = np.ones(N, np.float32)
        self._replicate("run_spec_decode", dict(
            row_ids=row_ids, first_tokens=first_tokens,
            positions0=positions0, slot_table=slot_table,
            dslot_table=dslot_table, kv_lens0=kv_lens0,
            page_indices=page_indices, num_seqs=num_seqs,
            temperature=temperature, top_k=top_k, top_p=top_p,
            adapter_ids=adapter_ids))
        K = dslot_table.shape[0]
        lora = adapter_ids is not None
        key = ("spec_decode", K, N, page_indices.shape, lora)
        fn = self._get_fn(key, lambda: self._build_spec_decode(K, lora))
        self._step_counter += 1
        seed = np.uint32((self.config.model.seed + self._step_counter)
                         & 0xFFFFFFFF)
        extra = (jnp.asarray(adapter_ids),) if lora else ()
        tokens, self.spec_hidden, self.kv_pages, self.kv_draft = fn(
            self.params, self.draft_params, self.kv_pages, self.kv_draft,
            self.spec_hidden, jnp.asarray(row_ids),
            jnp.asarray(first_tokens), jnp.asarray(positions0),
            jnp.asarray(slot_table.T), jnp.asarray(dslot_table),
            jnp.asarray(kv_lens0), jnp.asarray(page_indices),
            jnp.asarray([num_seqs], jnp.int32), jnp.asarray(temperature),
            jnp.asarray(top_k), jnp.asarray(top_p), seed, *extra)
        return np.asarray(jax.device_get(tokens))

    # ------------------------------------------------------------------
    # Public stepping API (numpy in / numpy out)
    # ------------------------------------------------------------------

    def run_step(self, token_ids: np.ndarray, positions: np.ndarray,
                 slot_mapping: np.ndarray, kv_lens: np.ndarray,
                 page_indices: np.ndarray, cu_q_lens: np.ndarray,
                 num_seqs: int, logits_indices: np.ndarray,
                 temperature: np.ndarray, top_k: np.ndarray,
                 top_p: np.ndarray, return_logits: bool,
                 kind: str = "mixed", keep_device: bool = False,
                 embeds_override: Optional[np.ndarray] = None,
                 override_mask: Optional[np.ndarray] = None,
                 adapter_ids: Optional[np.ndarray] = None,
                 cross_rows: Optional[np.ndarray] = None,
                 logits_rows: Optional[np.ndarray] = None
                 ) -> tuple[np.ndarray, Optional[np.ndarray]]:
        """One unified step. token_ids/positions/slot_mapping: [N] (N = a
        token bucket); kv_lens/logits_indices/sampling params: [S_step];
        page_indices: [S_step, PP] (PP = a page bucket); cu_q_lens:
        [S_step+1]. ``kind`` selects the attention path ("decode" /
        "prefill" / "mixed"). Returns (sampled_tokens [S_step],
        logits [S_step, V] | None). ``logits_rows``: [H] row indices —
        when set (with return_logits), the program gathers those rows'
        logits on device and the fetch ships [H, V], not [S_step, V]."""
        self._replicate("run_step", dict(
            token_ids=token_ids, positions=positions,
            slot_mapping=slot_mapping, kv_lens=kv_lens,
            page_indices=page_indices, cu_q_lens=cu_q_lens,
            num_seqs=num_seqs, logits_indices=logits_indices,
            temperature=temperature, top_k=top_k, top_p=top_p,
            return_logits=return_logits, kind=kind, keep_device=True,
            embeds_override=embeds_override, override_mask=override_mask,
            adapter_ids=adapter_ids, cross_rows=cross_rows,
            logits_rows=logits_rows))
        N = token_ids.shape[0]
        mm = embeds_override is not None
        cross = cross_rows is not None and self.cross_kv is not None
        gather = return_logits and logits_rows is not None
        key = ("step", kind, N, page_indices.shape, return_logits, mm,
               cross, logits_rows.shape if gather else None)
        fn = self._get_fn(
            key, lambda: self._build_step(kind, return_logits, mm, cross,
                                          gather_rows=gather))
        meta = RaggedMeta(
            slot_mapping=jnp.asarray(slot_mapping),
            kv_lens=jnp.asarray(kv_lens),
            page_indices=jnp.asarray(page_indices),
            cu_q_lens=jnp.asarray(cu_q_lens),
            num_seqs=jnp.asarray([num_seqs], jnp.int32),
            adapter_ids=(jnp.asarray(adapter_ids)
                         if adapter_ids is not None else None),
        )
        self._step_counter += 1
        seed = np.uint32((self.config.model.seed + self._step_counter)
                         & 0xFFFFFFFF)
        mm_args = ()
        if gather:
            mm_args = (jnp.asarray(logits_rows),)
        if mm:
            mm_args = mm_args + (jnp.asarray(embeds_override),
                                 jnp.asarray(override_mask))
        if cross:
            mm_args = mm_args + (self.cross_kv, self.cross_valid,
                                 jnp.asarray(cross_rows))
        out = fn(self.params, self.kv_pages, jnp.asarray(token_ids),
                 jnp.asarray(positions), meta, jnp.asarray(logits_indices),
                 jnp.asarray(temperature), jnp.asarray(top_k),
                 jnp.asarray(top_p), seed, *mm_args)
        if return_logits:
            tokens, logits, self.kv_pages = out
        else:
            tokens, self.kv_pages = out
            logits = None
        if keep_device:
            # Caller pipelines several dispatches and syncs once at the end.
            return tokens, logits
        tokens = np.asarray(jax.device_get(tokens))
        return tokens, (np.asarray(jax.device_get(logits))
                        if logits is not None else None)

    def _dummy_step(self, kind: str, N: int, S_step: int, PP: int,
                    return_logits: bool, gather_h: Optional[int] = None,
                    mm: bool = False) -> None:
        mm_kwargs = {}
        if mm:
            mm_kwargs = dict(
                embeds_override=np.zeros(
                    (N, self.config.model.hidden_size), np.float32),
                override_mask=np.zeros(N, bool))
        self.run_step(
            token_ids=np.zeros(N, np.int32),
            positions=np.zeros(N, np.int32),
            slot_mapping=np.full(N, -1, np.int32),
            kv_lens=np.zeros(S_step, np.int32),
            page_indices=np.zeros((S_step, PP), np.int32),
            cu_q_lens=np.zeros(S_step + 1, np.int32),
            num_seqs=0,
            logits_indices=np.zeros(S_step, np.int32),
            temperature=np.zeros(S_step, np.float32),
            top_k=np.full(S_step, -1, np.int32),
            top_p=np.ones(S_step, np.float32),
            return_logits=return_logits,
            kind=kind,
            logits_rows=(np.zeros(gather_h, np.int32)
                         if gather_h is not None else None),
            # Match the real programs' pytree structure when LoRA is on.
            adapter_ids=(np.zeros(N, np.int32)
                         if "lora" in self.params else None),
            # Cross-attention families always thread the row cache.
            cross_rows=(np.zeros(N, np.int32)
                        if self.cross_kv is not None else None),
            **mm_kwargs,
        )

    def _dummy_spec_prefill(self, N: int, PP: int) -> None:
        self.run_prefill_spec(
            token_ids=np.zeros(N, np.int32),
            positions=np.zeros(N, np.int32),
            slot_mapping=np.full(N, -1, np.int32),
            kv_len=0, page_indices=np.zeros((1, PP), np.int32),
            num_new=1, row=0,
            temperature=np.zeros(1, np.float32),
            top_k=np.full(1, -1, np.int32), top_p=np.ones(1, np.float32),
            adapter_ids=(np.zeros(N, np.int32)
                         if "lora" in self.params else None))

    def _dummy_spec_decode(self, N: int, PP: int, K: int) -> None:
        lora = "lora" in self.params
        W = self.config.speculative.num_fused_rounds
        if W > 1:
            self.run_spec_decode_multi(
                row_ids=np.zeros(N, np.int32),
                first_tokens=np.zeros(N, np.int32),
                positions0=np.zeros(N, np.int32),
                slot_caps=np.zeros(N, np.int32),
                kv_lens0=np.zeros(N, np.int32),
                page_indices=np.zeros((N, PP), np.int32),
                num_seqs=0, K=K, W=W,
                adapter_ids=np.zeros(N, np.int32) if lora else None)
            return
        self.run_spec_decode(
            row_ids=np.zeros(N, np.int32),
            first_tokens=np.zeros(N, np.int32),
            positions0=np.zeros(N, np.int32),
            slot_table=np.full((K + 1, N), -1, np.int32),
            dslot_table=np.full((K, N), -1, np.int32),
            kv_lens0=np.zeros(N, np.int32),
            page_indices=np.zeros((N, PP), np.int32),
            num_seqs=0,
            adapter_ids=np.zeros(N, np.int32) if lora else None)

    def _decode_token_buckets(self) -> list[int]:
        """Token buckets a decode step can land on: every bucket <= the
        seq budget, plus the bucket the full budget pads to (the runner
        buckets N = token_bucket(#decode items), items <= max_num_seqs)."""
        b = self.config.bucketing
        S = self.config.scheduler.max_num_seqs
        ns = {t for t in b.token_buckets if t <= S}
        ns.add(b.token_bucket(S))
        return sorted(ns)

    def _prefill_page_buckets(self, N: int) -> list[int]:
        """Page buckets reachable from a prefill dispatch at token bucket N.
        The runner picks PP = page_bucket(cdiv(end, block_size)); without
        prefix caching or chunking, end == num_new in (prev_bucket, N], so
        only the buckets covering that page range are reachable. Cache hits
        and chunked continuations make end range up to max_model_len —
        and so does n>1 sibling block adoption (kv_cache_manager
        .get_sibling_blocks works with prefix caching OFF): a sibling
        child dispatches with num_new in [1, block_size] but end = the
        full prompt, i.e. the smallest token bucket must cover every page
        bucket or the child cold-compiles mid-serving."""
        b = self.config.bucketing
        bs = self.config.cache.block_size
        if (self.config.cache.enable_prefix_caching
                or self.config.scheduler.enable_chunked_prefill
                or N <= b.token_bucket(bs)):
            return list(b.page_buckets)
        prev = max((t for t in b.token_buckets if t < N), default=0)
        lo = b.page_bucket(max(cdiv(prev + 1, bs), 1))
        hi = b.page_bucket(min(cdiv(N, bs), self.kv_spec.max_blocks_per_seq))
        return [pp for pp in b.page_buckets if lo <= pp <= hi]

    def warmup(self, mm: bool = False) -> None:
        """Pre-compile EVERY program variant reachable from this engine
        config (reference analogue: NxDI bucket warmup unless skip_warmup),
        so no serve-time request — logprobs/seeded/penalized (host-sampling
        gather variants), speculation rounds, chunked continuations,
        image-bearing prompts (``mm``) — hits a cold XLA compile. The
        compiled executables land in the ONE shared content-addressed
        persistent cache (keyed internally by HLO hash —
        _setup_compilation_cache), so a redeploy of the same config warms
        from disk and config-knob changes re-use every unchanged program. ``mm=True`` additionally warms the embeds-override prefill
        variants (embedding-merge vision families)."""
        b = self.config.bucketing
        spec_on = self.draft_model is not None
        spec_k = self.config.speculative.num_speculative_tokens
        n_before = len(self._fns)
        # Grouped-prefill variants (runner _form_prefill_groups eligibility
        # mirrored here): power-of-2 group sizes up to the config cap and
        # the per-step admission limit.
        sched = self.config.scheduler
        group_sizes = []
        if (sched.prefill_group_size > 1 and not spec_on
                and self.cross_kv is None and not mm):
            # Per-step prefill count can reach the cold-start admission
            # burst cap (scheduler._can_admit: max_num_seqs // 2 when
            # nothing is decoding), not just max_prompt_batch_size; group
            # sizes beyond it would cold-compile at exactly the cold-start
            # moment. Runtime clamps the cap to a power of 2 (runner
            # _form_prefill_groups), mirrored here.
            gmax = min(sched.prefill_group_size,
                       sched.max_num_seqs if sched.enable_chunked_prefill
                       else max(sched.max_prompt_batch_size,
                                sched.max_num_seqs // 2))
            g = 2
            while g <= gmax:
                group_sizes.append(g)
                g *= 2
        for N in self._decode_token_buckets():
            for PP in b.page_buckets:
                self._dummy_step("decode", N, N, PP, False)
                # Host-sampling rows fetch device-gathered logits; the
                # program is specialized on the H bucket.
                for H in host_gather_buckets(N):
                    self._dummy_step("decode", N, N, PP, True, gather_h=H)
                if spec_on and spec_k >= 1:
                    self._dummy_spec_decode(N, PP, spec_k)
        for N in b.token_buckets:
            for PP in self._prefill_page_buckets(N):
                self._dummy_step("prefill", N, 1, PP, False)
                # Host-sampling prefill ships the row's full logits.
                self._dummy_step("prefill", N, 1, PP, True)
                if mm:
                    self._dummy_step("prefill", N, 1, PP, False, mm=True)
                    self._dummy_step("prefill", N, 1, PP, True, mm=True)
                if spec_on:
                    self._dummy_spec_prefill(N, PP)
                # Grouped programs only exist below the flash-CE threshold
                # (the runner routes long-context prompts to single-seq
                # dispatch, which has the flash path; the grouped program
                # is dense-scores only).
                from vllm_neuron_tpu.ops.ragged_attention import \
                    _flash_prefill_min_t
                if N < _flash_prefill_min_t():
                    for G in group_sizes:
                        self._dummy_step("prefill", G * N, G, PP, False)
        if _packed_h2d():
            # Window unpack programs are keyed on (K, N, PP); K is the
            # window's step count (2..decode_window — K=1 takes the
            # single-step path).
            W = self.config.scheduler.decode_window
            for N in self._decode_token_buckets():
                for PP in b.page_buckets:
                    for K in range(2, W + 1):
                        unpack = self._get_fn(
                            ("unpack_window", K, N, PP),
                            lambda: jax.jit(_unpack_window,
                                            static_argnames=("K",)))
                        jax.block_until_ready(unpack(
                            jnp.zeros((7 + K + PP, N), jnp.int32), K=K))
        logger.info("warmup compiled %d programs", len(self._fns) - n_before)

    def memory_stats(self) -> dict:
        """Device memory introspection (reference analogue:
        torch.classes.neuron.Runtime().get_vnc_memory_stats(),
        neuron_worker.py:54-55)."""
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        return stats or {}
