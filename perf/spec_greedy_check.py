# SPDX-License-Identifier: Apache-2.0
"""ON-CHIP spec greedy-identity check: with the paged verify KERNEL in the
fused spec programs (CPU tests take the dense path), greedy output with
speculation must be token-identical to without. Run ALONE on the TPU.

    python perf/spec_greedy_check.py [K] [W]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "ckpt_tinypy")
    from vllm_neuron_tpu import LLM, SamplingParams
    val = np.load(os.path.join(ckpt, "val_tokens.npy"))
    prompts = [{"prompt_token_ids": val[i * 353:][:96].tolist()}
               for i in range(8)]
    sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True,
                        detokenize=False)
    kw = dict(model=ckpt, skip_tokenizer_init=True, dtype="bfloat16",
              max_model_len=256, max_num_seqs=8, block_size=32,
              override_tpu_config={"context_encoding_buckets": [96],
                                   "token_generation_buckets": [8]})
    base = LLM(**kw)
    want = [o.outputs[0].token_ids
            for o in base.generate(prompts, [sp] * len(prompts))]
    del base
    spec = LLM(speculative_config={
        "model": ckpt + "_eagle", "num_speculative_tokens": K,
        "method": "eagle", "num_fused_rounds": W}, **kw)
    got = [o.outputs[0].token_ids
           for o in spec.generate(prompts, [sp] * len(prompts))]
    fns = spec.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode_multi" for k in fns)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"prompt {i}: spec {g[:12]}... vs base {w[:12]}..."
    snap = spec.engine.metrics.snapshot()
    print(f"SPEC GREEDY IDENTITY OK (K={K} W={W}, 8 prompts x 48 toks; "
          f"acceptance {snap['spec_decode_acceptance_rate']:.3f})")


if __name__ == "__main__":
    main()
