# SPDX-License-Identifier: Apache-2.0
"""Perplexity evaluation harness (BASELINE.md: WikiText-2-style ppl delta
between quantized and BF16 runs must stay <= 0.05 at matched bit widths).

Teacher-forced NLL over a token stream, evaluated in windows through the
engine's prefill program (no sampling). Works with a text file + the model's
tokenizer, or with a raw .npy token array.

Usage:
  python -m vllm_neuron_tpu.tools.eval_ppl --model <dir> \
      [--text wiki.txt | --tokens toks.npy] [--quantization int8] \
      [--window 1024] [--max-tokens 32768]
"""
from __future__ import annotations

import argparse
import math

import numpy as np


def evaluate_ppl(model_dir: str, token_ids: np.ndarray, window: int = 1024,
                 dtype: str = "bfloat16", quantization=None,
                 kv_cache_dtype: str = "auto",
                 override_tpu_config: dict = None) -> dict:
    import jax
    import jax.numpy as jnp

    from vllm_neuron_tpu.engine.llm import build_engine_config
    from vllm_neuron_tpu.models.registry import get_model
    from vllm_neuron_tpu.worker.executor import ModelExecutor
    from vllm_neuron_tpu.ops.ragged_attention import RaggedMeta

    config = build_engine_config(
        model_dir, dtype=dtype, max_model_len=window + 1, max_num_seqs=1,
        block_size=32, quantization=quantization,
        kv_cache_dtype=kv_cache_dtype,
        override_tpu_config={"context_encoding_buckets": [window],
                             "token_generation_buckets": [1],
                             **(override_tpu_config or {})})
    model = get_model(config)
    params = model.load_params(model_dir)
    executor = ModelExecutor(model, config, params)
    spec = executor.kv_spec
    bs = spec.block_size
    n_pages = (window + bs - 1) // bs

    @jax.jit
    def window_nll(kv, ids, targets, valid):
        pi = jnp.arange(1, n_pages + 1, dtype=jnp.int32)[None]
        pos = jnp.arange(window, dtype=jnp.int32)
        slots = (pi[0][pos // bs] * bs + pos % bs).astype(jnp.int32)
        meta = RaggedMeta(
            slot_mapping=slots,
            kv_lens=jnp.asarray([window], jnp.int32),
            page_indices=jnp.pad(pi, ((0, 0),
                                      (0, spec.max_blocks_per_seq - n_pages))),
            cu_q_lens=jnp.asarray([0, window], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
        )
        hidden, _ = model.forward(params, ids, pos, kv, meta, kind="prefill")
        logits = model.compute_logits(params, hidden)  # [window, V] f32
        logz = jax.nn.logsumexp(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logits, targets[:, None],
                                       axis=-1)[:, 0] - logz
        nll = -(tok_logp * valid).sum()
        return nll, valid.sum()

    total_nll, total_tok = 0.0, 0
    stream = token_ids.astype(np.int32)
    for start in range(0, len(stream) - 1, window):
        chunk = stream[start:start + window + 1]
        if len(chunk) < 2:
            break
        ids = np.zeros(window, np.int32)
        targets = np.zeros(window, np.int32)
        valid = np.zeros(window, np.float32)
        n = len(chunk) - 1
        ids[:n] = chunk[:-1]
        targets[:n] = chunk[1:]
        valid[:n] = 1.0
        kv = spec.allocate()  # FP8 specs get the scaled container
        nll, cnt = window_nll(kv, jnp.asarray(ids), jnp.asarray(targets),
                              jnp.asarray(valid))
        total_nll += float(nll)
        total_tok += int(cnt)
    avg = total_nll / max(total_tok, 1)
    return {"tokens": total_tok, "avg_nll": avg, "ppl": math.exp(avg)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--text")
    p.add_argument("--tokens")
    p.add_argument("--window", type=int, default=1024)
    p.add_argument("--max-tokens", type=int, default=32768)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantization", default=None)
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--int4-group-size", type=int, default=None,
                   help="int4 quantization group size along K "
                        "(default 128; smaller = more accurate, more "
                        "scale traffic)")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu) — the env var is "
                        "pinned on axon hosts, a config update is required "
                        "(CLAUDE.md)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.tokens:
        toks = np.load(args.tokens)
    elif args.text:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model)
        with open(args.text) as f:
            toks = np.asarray(tok.encode(f.read()))
    else:
        raise SystemExit("need --text or --tokens")
    toks = toks[:args.max_tokens]
    override = ({"int4_group_size": args.int4_group_size}
                if args.int4_group_size else None)
    out = evaluate_ppl(args.model, toks, window=args.window,
                       dtype=args.dtype, quantization=args.quantization,
                       kv_cache_dtype=args.kv_cache_dtype,
                       override_tpu_config=override)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
