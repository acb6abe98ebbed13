# SPDX-License-Identifier: Apache-2.0
"""Train an Eagle-1 draft for the ckpt_tinypy accuracy checkpoint.

Purpose: spec decode's VALUE (not just correctness) must be measured with
a draft that actually predicts the target — a random draft's acceptance is
~1/V and only measures machinery overhead. No draft checkpoints are
downloadable here, so train one: fc + ONE Llama decoder layer distilled to
continue the 4-layer ckpt_tinypy byte model (reference analogue: the Eagle
draft checkpoints the reference repairs and serves via fused speculation,
test/utils/eagle_nxdi_util.py, model_loader.py:243-303).

Semantics match serving exactly (executor.run_spec_decode):
  - draft input at position i: concat(embed(t_{i+1}), f_i) where f_i is
    the target's PRE-final-norm hidden at i (models/llama.py:448 applies
    final_norm inside compute_logits, so forward() hidden is pre-norm);
  - draft logits = draft_feature @ target.lm_head, NO final norm
    (executor.py:557-559);
  - draft positions are target positions - 1 (eagle.py docstring).

Usage:
  python -m vllm_neuron_tpu.tools.train_eagle_tiny \
      --target /root/repo/ckpt_tinypy --out /root/repo/ckpt_tinypy_eagle \
      [--steps 2000] [--platform cpu]
Writes <out>/model.safetensors + config.json loadable by EagleDraft.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_target(model_dir: str):
    """ckpt safetensors -> train-layout params ([K, N] matrices, f32)."""
    from safetensors.numpy import load_file
    raw = load_file(os.path.join(model_dir, "model.safetensors"))
    raw = {k: np.asarray(v, np.float32) for k, v in raw.items()}
    cfg = json.load(open(os.path.join(model_dir, "config.json")))
    L = cfg["num_hidden_layers"]
    names = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
             "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
             "wg": "mlp.gate_proj", "wu": "mlp.up_proj",
             "wd": "mlp.down_proj"}
    layers = {k: np.stack([raw[f"model.layers.{i}.{hf}.weight"].T
                           for i in range(L)])
              for k, hf in names.items()}
    layers["attn_norm"] = np.stack(
        [raw[f"model.layers.{i}.input_layernorm.weight"] for i in range(L)])
    layers["mlp_norm"] = np.stack(
        [raw[f"model.layers.{i}.post_attention_layernorm.weight"]
         for i in range(L)])
    params = {
        "embed": raw["model.embed_tokens.weight"],
        "final_norm": raw["model.norm.weight"],
        "lm_head": raw["lm_head.weight"].T.copy(),
        "layers": layers,
    }
    return params, cfg


def target_features(params, ids, cfg, inv_freq):
    """Teacher-forced PRE-final-norm hidden states [B, T, H]."""
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.norm import rms_norm
    from vllm_neuron_tpu.ops.rope import apply_rope

    B, T = ids.shape
    nH = cfg["num_attention_heads"]
    nKV = cfg["num_key_value_heads"]
    D = cfg["head_dim"]
    G = nH // nKV
    eps = cfg["rms_norm_eps"]
    x = params["embed"][ids]
    pos = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer(x, lp):
        h = rms_norm(x, lp["attn_norm"], eps)
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
        h = rms_norm(x, lp["mlp_norm"], eps)
        x = x + (jax.nn.silu(h @ lp["wg"]) * (h @ lp["wu"])) @ lp["wd"]
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x  # pre-final-norm (what the executor feeds the draft)


def draft_forward(dparams, tparams, tokens, feats, cfg, inv_freq):
    """Dense-causal mirror of EagleDraft.forward (models/eagle.py:119).
    tokens: [B, T] (= t_{i+1}); feats: [B, T, H] (= f_i); returns draft
    features [B, T, H]."""
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.ops.norm import rms_norm
    from vllm_neuron_tpu.ops.rope import apply_rope

    B, T = tokens.shape
    nH = cfg["num_attention_heads"]
    nKV = cfg["num_key_value_heads"]
    D = cfg["head_dim"]
    G = nH // nKV
    eps = cfg["rms_norm_eps"]
    emb = tparams["embed"][tokens]
    x = jnp.concatenate([emb, feats], axis=-1) @ dparams["fc"]
    # Draft position = target position - 1; relative geometry is what
    # rope encodes, so 0..T-1 matches serving.
    pos = jnp.arange(T, dtype=jnp.int32)[None].repeat(B, 0)
    causal = jnp.tril(jnp.ones((T, T), bool))
    lp = dparams["layer"]
    h = rms_norm(x, lp["attn_norm"], eps)
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
    h = rms_norm(x, lp["mlp_norm"], eps)
    x = x + (jax.nn.silu(h @ lp["wg"]) * (h @ lp["wu"])) @ lp["wd"]
    return x


def export_draft(dparams, cfg, out_dir: str) -> None:
    import jax
    import ml_dtypes
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), dparams)
    lp = p["layer"]
    names = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
             "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
             "wg": "mlp.gate_proj", "wu": "mlp.up_proj",
             "wd": "mlp.down_proj"}
    tensors = {"fc.weight": p["fc"].T.copy()}  # HF stores [out, in]
    for ours, hf in names.items():
        tensors[f"model.layers.0.{hf}.weight"] = lp[ours].T.copy()
    tensors["model.layers.0.input_layernorm.weight"] = lp["attn_norm"]
    tensors["model.layers.0.post_attention_layernorm.weight"] = \
        lp["mlp_norm"]
    tensors = {k: v.astype(ml_dtypes.bfloat16) for k, v in tensors.items()}
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    dcfg = dict(cfg)
    dcfg["num_hidden_layers"] = 1
    dcfg["architectures"] = ["LlamaForCausalLM"]
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dcfg, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from vllm_neuron_tpu.ops.rope import compute_inv_freq
    from vllm_neuron_tpu.tools.train_tiny import build_corpus

    tparams, cfg = load_target(args.target)
    tparams = jax.tree.map(jnp.asarray, tparams)
    H = cfg["hidden_size"]
    inv_freq = jnp.asarray(compute_inv_freq(cfg["head_dim"],
                                            cfg["rope_theta"], None))
    train, _ = build_corpus()

    keys = iter(jax.random.split(jax.random.PRNGKey(args.seed), 12))

    def w(shape, fan_in):
        return jax.random.normal(next(keys), shape,
                                 jnp.float32) / np.sqrt(fan_in)

    nH, nKV, D = (cfg["num_attention_heads"], cfg["num_key_value_heads"],
                  cfg["head_dim"])
    Im = cfg["intermediate_size"]
    dparams = {
        "fc": w((2 * H, H), 2 * H),
        "layer": {
            "attn_norm": jnp.ones((H,), jnp.float32),
            "mlp_norm": jnp.ones((H,), jnp.float32),
            "wq": w((H, nH * D), H), "wk": w((H, nKV * D), H),
            "wv": w((H, nKV * D), H), "wo": w((nH * D, H), nH * D),
            "wg": w((H, Im), H), "wu": w((H, Im), H),
            "wd": w((Im, H), Im),
        },
    }

    def loss_fn(dparams, ids):
        # ids: [B, S+2]. Target sees t_0..t_S -> features f_0..f_S.
        # Draft at i consumes (t_{i+1}, f_i), predicts t_{i+2}.
        feats = target_features(tparams, ids[:, :-2], cfg, inv_freq)
        dfeat = draft_forward(dparams, tparams, ids[:, 1:-1], feats, cfg,
                              inv_freq)
        logits = dfeat @ tparams["lm_head"]  # NO final norm (serving match)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        labels = ids[:, 2:]
        nll = -jnp.take_along_axis(logp, labels[..., None],
                                   axis=-1)[..., 0]
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return nll.mean(), acc

    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.05)
    opt = optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = opt.init(dparams)

    @jax.jit
    def step(dparams, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            dparams, batch)
        updates, opt_state = opt.update(grads, opt_state, dparams)
        return optax.apply_updates(dparams, updates), opt_state, loss, acc

    rng = np.random.default_rng(args.seed + 1)
    span = args.seq + 2
    import time
    t0 = time.time()
    for it in range(args.steps):
        starts = rng.integers(0, len(train) - span, size=args.batch)
        batch = np.stack([train[s:s + span] for s in starts])
        dparams, opt_state, loss, acc = step(dparams, opt_state,
                                             jnp.asarray(batch))
        if it % 200 == 0 or it == args.steps - 1:
            print(f"step {it}: loss {float(loss):.4f} "
                  f"draft-top1 {float(acc):.3f} ({time.time()-t0:.0f}s)",
                  flush=True)

    export_draft(dparams, cfg, args.out)
    print(f"exported Eagle draft to {args.out}")


if __name__ == "__main__":
    main()
