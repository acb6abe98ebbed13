# SPDX-License-Identifier: Apache-2.0
"""Train a tiny byte-level Llama from scratch and export an HF checkpoint.

Purpose: the accuracy north star (BASELINE.md) requires ppl deltas between
BF16 and quantized runs measured on REAL (trained) weights — quantization
error on random weights is unrepresentative (no learned outlier structure).
This environment has no downloadable checkpoints, so we train one: a genuine
Llama-architecture model (HF-loadable; RoPE/RMSNorm/SwiGLU exactly as
served) on locally available text (Python stdlib sources), byte-level vocab.

The export is standard HF safetensors + config.json so BOTH loaders work:
  - vllm_neuron_tpu.models.weights (the production path under test), and
  - transformers.LlamaForCausalLM (the independent oracle).

Usage:
  python -m vllm_neuron_tpu.tools.train_tiny --out /tmp/tinypy \
      [--steps 3000] [--dim 256] [--layers 4]
Writes: <out>/model.safetensors, config.json, val_tokens.npy (held-out
byte stream for tools/eval_ppl.py --tokens).
"""
from __future__ import annotations

import argparse
import functools
import glob
import json
import os

import numpy as np


# --------------------------------------------------------------------------
# Corpus: Python stdlib sources — guaranteed-present, structured text.
# --------------------------------------------------------------------------


def build_corpus(max_bytes: int = 48 * 2**20,
                 val_bytes: int = 2**19) -> tuple[np.ndarray, np.ndarray]:
    import sysconfig
    stdlib = sysconfig.get_paths()["stdlib"]
    files = sorted(glob.glob(os.path.join(stdlib, "**", "*.py"),
                             recursive=True))
    # Deterministic shuffle so train/val aren't alphabetical neighbours.
    rng = np.random.default_rng(0)
    rng.shuffle(files)
    chunks, total = [], 0
    for f in files:
        try:
            data = open(f, "rb").read()
        except OSError:
            continue
        chunks.append(data)
        total += len(data)
        if total >= max_bytes:
            break
    blob = b"\n".join(chunks)
    toks = np.frombuffer(blob, dtype=np.uint8).astype(np.int32)
    return toks[val_bytes:], toks[:val_bytes]


# --------------------------------------------------------------------------
# Model: teacher-forced dense-causal Llama forward (training only; serving
# uses the paged stack — ops are shared so conventions match exactly).
# --------------------------------------------------------------------------


def init_params(rng, cfg) -> dict:
    import jax
    import jax.numpy as jnp
    H, I, V, L = cfg["H"], cfg["I"], cfg["V"], cfg["L"]
    nH, nKV, D = cfg["heads"], cfg["kv_heads"], cfg["head_dim"]
    keys = iter(jax.random.split(rng, 12))

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32)
                / np.sqrt(fan_in))

    return {
        "embed": w(next(keys), (V, H), H),
        "lm_head": w(next(keys), (H, V), H),
        "final_norm": jnp.ones((H,), jnp.float32),
        "layers": {
            "wq": w(next(keys), (L, H, nH * D), H),
            "wk": w(next(keys), (L, H, nKV * D), H),
            "wv": w(next(keys), (L, H, nKV * D), H),
            "wo": w(next(keys), (L, nH * D, H), nH * D),
            "wg": w(next(keys), (L, H, I), H),
            "wu": w(next(keys), (L, H, I), H),
            "wd": w(next(keys), (L, I, H), I),
            "attn_norm": jnp.ones((L, H), jnp.float32),
            "mlp_norm": jnp.ones((L, H), jnp.float32),
        },
    }


def forward(params, ids, cfg, inv_freq):
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.norm import rms_norm
    from vllm_neuron_tpu.ops.rope import apply_rope

    B, T = ids.shape
    nH, nKV, D = cfg["heads"], cfg["kv_heads"], cfg["head_dim"]
    G = nH // nKV
    x = params["embed"][ids]  # [B, T, H]
    pos = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer(x, lp):
        h = rms_norm(x, lp["attn_norm"], cfg["eps"])
        q = (h @ lp["wq"]).reshape(B, T, nH, D)
        k = (h @ lp["wk"]).reshape(B, T, nKV, D)
        v = (h @ lp["wv"]).reshape(B, T, nKV, D)
        q, k = apply_rope(q, k, pos, inv_freq)
        qg = q.reshape(B, T, nKV, G, D)
        s = jnp.einsum("btkgd,bskd->bkgts", qg, k) / np.sqrt(D)
        s = jnp.where(causal[None, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bkgts,bskd->btkgd", p, v).reshape(B, T, nH * D)
        x = x + o @ lp["wo"]
        h = rms_norm(x, lp["mlp_norm"], cfg["eps"])
        x = x + (jax.nn.silu(h @ lp["wg"]) * (h @ lp["wu"])) @ lp["wd"]
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg["eps"])
    return x @ params["lm_head"]  # [B, T, V]


def loss_fn(params, batch, cfg, inv_freq):
    import jax
    import jax.numpy as jnp
    ids, targets = batch[:, :-1], batch[:, 1:]
    logits = forward(params, ids, cfg, inv_freq)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


# --------------------------------------------------------------------------
# HF export
# --------------------------------------------------------------------------


def export_hf(params, cfg, out_dir: str) -> None:
    import jax
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    tensors = {
        "model.embed_tokens.weight": p["embed"],
        "model.norm.weight": p["final_norm"],
        "lm_head.weight": p["lm_head"].T.copy(),
    }
    L = cfg["L"]
    lay = p["layers"]
    hf_names = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
                "wg": "mlp.gate_proj", "wu": "mlp.up_proj",
                "wd": "mlp.down_proj"}
    for i in range(L):
        base = f"model.layers.{i}."
        for ours, hf in hf_names.items():
            # Ours: [K, N]; HF linear stores [out, in] = [N, K].
            tensors[base + hf + ".weight"] = lay[ours][i].T.copy()
        tensors[base + "input_layernorm.weight"] = lay["attn_norm"][i]
        tensors[base + "post_attention_layernorm.weight"] = \
            lay["mlp_norm"][i]
    # bf16 on disk: the dtype every serving config loads.
    import ml_dtypes
    tensors = {k: v.astype(ml_dtypes.bfloat16) for k, v in tensors.items()}
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))

    hf_config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg["V"],
        "hidden_size": cfg["H"],
        "intermediate_size": cfg["I"],
        "num_hidden_layers": cfg["L"],
        "num_attention_heads": cfg["heads"],
        "num_key_value_heads": cfg["kv_heads"],
        "head_dim": cfg["head_dim"],
        "max_position_embeddings": 2048,
        "rope_theta": cfg["rope_theta"],
        "rms_norm_eps": cfg["eps"],
        "tie_word_embeddings": False,
        "hidden_act": "silu",
        "torch_dtype": "bfloat16",
        "bos_token_id": 1,
        "eos_token_id": 2,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=1)
    with open(os.path.join(out_dir, "generation_config.json"), "w") as f:
        json.dump({"_from_model_config": True, "bos_token_id": 1,
                   "eos_token_id": 2}, f)


# --------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform, e.g. 'cpu' (the env var is "
                    "pinned on this machine — see CLAUDE.md)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from vllm_neuron_tpu.ops.rope import compute_inv_freq

    cfg = dict(H=args.dim, I=args.dim * 4, V=256, L=args.layers,
               heads=8, kv_heads=4, head_dim=args.dim // 8,
               eps=1e-5, rope_theta=10000.0)
    train, val = build_corpus()
    print(f"corpus: {len(train)/1e6:.1f}M train bytes, "
          f"{len(val)/1e6:.2f}M val bytes")

    inv_freq = jnp.asarray(compute_inv_freq(cfg["head_dim"],
                                            cfg["rope_theta"], None))
    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1),
        end_value=args.lr * 0.05)
    opt = optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg,
                                                  inv_freq)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed + 1)
    span = args.seq + 1
    n_pos = len(train) - span
    import time
    t0 = time.time()
    for it in range(args.steps):
        starts = rng.integers(0, n_pos, size=args.batch)
        batch = np.stack([train[s:s + span] for s in starts])
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(batch))
        if it % 200 == 0 or it == args.steps - 1:
            print(f"step {it}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    export_hf(params, cfg, args.out)
    np.save(os.path.join(args.out, "val_tokens.npy"), val)
    print(f"exported HF checkpoint to {args.out}")


if __name__ == "__main__":
    main()
