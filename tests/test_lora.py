# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA serving end-to-end vs a merged-weight HF oracle.

The reference's LoRA surface raises NotImplementedError at runtime
(reference: vllm_neuron/worker/neuron_worker.py:123-138 — SURVEY.md V9);
this framework implements it (lora_loader.py, ops/lora.py), so the oracle is
plain HF transformers with each adapter's scaled B@A delta merged into the
base weights: per-request greedy tokens must match the corresponding merged
model exactly, including when adapters are mixed in one continuous batch.
"""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

R = 4
ALPHA = 8.0
TARGETS = ["q_proj", "v_proj", "gate_proj"]


def _make_adapter(path, hf_cfg, seed):
    """Write a synthetic PEFT checkpoint targeting q/v/gate projections."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    H = hf_cfg.hidden_size
    kv = hf_cfg.num_key_value_heads * (H // hf_cfg.num_attention_heads)
    dims = {"q_proj": (H, H), "v_proj": (H, kv),
            "gate_proj": (H, hf_cfg.intermediate_size)}
    tensors = {}
    for l in range(hf_cfg.num_hidden_layers):
        for mod, (din, dout) in dims.items():
            sub = "self_attn" if "proj" in mod and mod[0] in "qkvo" \
                else "mlp"
            base = f"base_model.model.model.layers.{l}.{sub}.{mod}"
            tensors[f"{base}.lora_A.weight"] = (
                rng.standard_normal((R, din)) * 0.05).astype(np.float32)
            tensors[f"{base}.lora_B.weight"] = (
                rng.standard_normal((dout, R)) * 0.05).astype(np.float32)
    path.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(path / "adapter_model.safetensors"))
    (path / "adapter_config.json").write_text(json.dumps({
        "r": R, "lora_alpha": ALPHA, "target_modules": TARGETS,
        "peft_type": "LORA",
    }))
    return str(path)


def _merged_oracle(model_dir, adapter_dir):
    """HF model with the adapter's scaled delta merged into the weights."""
    from safetensors.numpy import load_file
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(model_dir,
                                             torch_dtype=torch.float32)
    if adapter_dir is not None:
        tensors = load_file(f"{adapter_dir}/adapter_model.safetensors")
        scale = ALPHA / R
        for key, a in tensors.items():
            if not key.endswith("lora_A.weight"):
                continue
            b = tensors[key.replace("lora_A", "lora_B")]
            target = key[len("base_model.model."):-len(".lora_A.weight")]
            mod = model.get_submodule(target)
            with torch.no_grad():
                mod.weight += torch.from_numpy(b @ a) * scale
    model.eval()
    return model


def _hf_greedy(model, prompt, n):
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=n, do_sample=False)
    return out[0, len(prompt):].tolist()


@pytest.fixture(scope="module")
def adapters(tmp_path_factory, tiny_llama_dir):
    from transformers import AutoConfig
    hf_cfg = AutoConfig.from_pretrained(tiny_llama_dir)
    root = tmp_path_factory.mktemp("lora")
    a1 = _make_adapter(root / "a1", hf_cfg, seed=11)
    a2 = _make_adapter(root / "a2", hf_cfg, seed=22)
    return a1, a2


def test_mixed_adapter_batch_matches_merged_oracles(tiny_llama_dir,
                                                    adapters):
    from vllm_neuron_tpu import LLM, SamplingParams

    a1, a2 = adapters
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
              lora_adapters={"a1": a1, "a2": a2})
    prompts = [[5, 77, 301, 44, 12], [9, 400, 3, 250], [5, 77, 301, 44, 12],
               [17, 88, 299]]
    loras = [None, "a1", "a1", "a2"]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(
        [{"prompt_token_ids": p, "lora": lr}
         for p, lr in zip(prompts, loras)], [sp] * len(prompts))

    oracles = {None: _merged_oracle(tiny_llama_dir, None),
               "a1": _merged_oracle(tiny_llama_dir, a1),
               "a2": _merged_oracle(tiny_llama_dir, a2)}
    for prompt, lr, out in zip(prompts, loras, outs):
        expect = _hf_greedy(oracles[lr], prompt, 12)
        got = list(out.outputs[0].token_ids)
        assert got == expect, f"adapter={lr}: {got} != {expect}"
    # The adapters actually change the output (the deltas are not no-ops).
    assert list(outs[0].outputs[0].token_ids) != \
        list(outs[2].outputs[0].token_ids)


def test_prefix_cache_isolated_per_adapter(tiny_llama_dir, adapters):
    """A prompt prefilled under the base model must NOT seed cached KV for
    the same prompt under an adapter (K/V projections differ)."""
    from vllm_neuron_tpu import LLM, SamplingParams

    a1, _ = adapters
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=4, skip_tokenizer_init=True,
              enable_prefix_caching=True, lora_adapters={"a1": a1})
    prompt = [5, 77, 301, 44, 12, 9, 3, 250, 17]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base_out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    lora_out = llm.generate({"prompt_token_ids": prompt, "lora": "a1"},
                            sp)[0]
    assert list(base_out.outputs[0].token_ids) == \
        _hf_greedy(_merged_oracle(tiny_llama_dir, None), prompt, 8)
    assert list(lora_out.outputs[0].token_ids) == \
        _hf_greedy(_merged_oracle(tiny_llama_dir, a1), prompt, 8)


def test_unknown_adapter_rejected(tiny_llama_dir, adapters):
    from vllm_neuron_tpu import LLM, SamplingParams

    a1, _ = adapters
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              lora_adapters={"a1": a1})
    with pytest.raises(KeyError):
        llm.generate({"prompt_token_ids": [1, 2, 3], "lora": "nope"},
                     SamplingParams(max_tokens=2))


def test_lora_with_tensor_parallel(tiny_llama_dir, adapters):
    """Replicated LoRA stacks + sharded base weights on a tp=2 CPU mesh:
    tokens must still match the merged oracle exactly."""
    from vllm_neuron_tpu import LLM, SamplingParams

    a1, _ = adapters
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
              tensor_parallel_size=2, lora_adapters={"a1": a1})
    prompt = [5, 77, 301, 44, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt, "lora": "a1"}, sp)[0]
    assert list(out.outputs[0].token_ids) == \
        _hf_greedy(_merged_oracle(tiny_llama_dir, a1), prompt, 10)


def test_server_routes_lora_by_model_name(tiny_llama_dir, adapters):
    """OpenAI server: adapters appear in /v1/models and `model=<adapter>`
    routes the request through it (vLLM --lora-modules convention)."""
    import asyncio
    import threading

    from tests.test_api_server import _free_port, _get, _post
    from vllm_neuron_tpu.engine.async_llm import AsyncEngine
    from vllm_neuron_tpu.engine.llm import build_engine_config
    from vllm_neuron_tpu.server.api_server import OpenAIServer

    a1, _ = adapters
    config = build_engine_config(tiny_llama_dir, dtype="float32",
                                 max_model_len=64, max_num_seqs=2,
                                 block_size=16, lora_adapters={"a1": a1})
    port = _free_port()
    ready = threading.Event()
    holder = {}

    def run():
        async def main():
            engine = AsyncEngine(config, tokenizer=None)
            engine.start(asyncio.get_running_loop())
            srv = OpenAIServer(engine, served_model_name="tiny",
                               lora_modules={"a1": a1})
            http = await srv.app.serve("127.0.0.1", port)
            holder["engine"] = engine
            ready.set()
            async with http:
                await http.serve_forever()

        asyncio.run(main())

    threading.Thread(target=run, daemon=True).start()
    assert ready.wait(timeout=180)
    base = f"http://127.0.0.1:{port}"
    try:
        models = {m["id"] for m in _get(f"{base}/v1/models")["data"]}
        assert models == {"tiny", "a1"}
        prompt = [5, 77, 301, 44, 12]
        body = {"prompt": prompt, "max_tokens": 8, "temperature": 0.0,
                "ignore_eos": True}
        via_lora = _post(f"{base}/v1/completions",
                         dict(body, model="a1"))
        assert via_lora["choices"][0]["finish_reason"] == "length"
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(f"{base}/v1/completions", dict(body, model="nope"))
        assert exc.value.code == 400
    finally:
        holder["engine"].shutdown()


def test_lora_spec_greedy_exact(tiny_llama_dir, adapters,
                                tmp_path_factory):
    """LoRA composes with Eagle speculation: adapter ids ride the target
    prefill/verify metas while the draft stays base-model. Greedy outputs
    must match the merged-weight HF oracle exactly (acceptance may drop,
    content may not)."""
    import torch
    from safetensors.torch import save_file
    from transformers import AutoConfig, LlamaConfig, LlamaForCausalLM

    from vllm_neuron_tpu import LLM, SamplingParams

    target_cfg = AutoConfig.from_pretrained(tiny_llama_dir)
    dcfg = LlamaConfig(
        vocab_size=target_cfg.vocab_size,
        hidden_size=target_cfg.hidden_size,
        intermediate_size=target_cfg.intermediate_size,
        num_hidden_layers=1,
        num_attention_heads=target_cfg.num_attention_heads,
        num_key_value_heads=target_cfg.num_key_value_heads,
        max_position_embeddings=target_cfg.max_position_embeddings)
    torch.manual_seed(3)
    dm = LlamaForCausalLM(dcfg)
    sd = {k: v for k, v in dm.state_dict().items()
          if k.startswith("model.layers.0.") and "rotary" not in k}
    H = dcfg.hidden_size
    sd["fc.weight"] = torch.randn(H, 2 * H) * 0.02
    droot = tmp_path_factory.mktemp("lora_eagle")
    save_file(sd, str(droot / "model.safetensors"))
    dcfg.save_pretrained(droot)

    a1, a2 = adapters
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
              lora_adapters={"a1": a1, "a2": a2},
              speculative_config={"model": str(droot),
                                  "num_speculative_tokens": 3,
                                  "method": "eagle"})
    prompts = [[5, 77, 301, 44, 12], [9, 400, 3, 250], [17, 88, 299]]
    loras = [None, "a1", "a2"]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(
        [{"prompt_token_ids": p, "lora": lr}
         for p, lr in zip(prompts, loras)], [sp] * len(prompts))
    oracles = {None: _merged_oracle(tiny_llama_dir, None),
               "a1": _merged_oracle(tiny_llama_dir, a1),
               "a2": _merged_oracle(tiny_llama_dir, a2)}
    for prompt, lr, out in zip(prompts, loras, outs):
        expect = _hf_greedy(oracles[lr], prompt, 12)
        got = list(out.outputs[0].token_ids)
        assert got == expect, f"adapter={lr}: {got} != {expect}"
    fns = llm.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode" for k in fns)


def test_kitchen_sink_composition(tiny_llama_dir, adapters):
    """Feature-interaction stress: int8 quant + int8 head + prefix
    caching + mixed LoRA adapters + n>1 seeded sampling + greedy rows in
    ONE engine. Greedy+adapter rows must still match the merged-weight
    oracle; seeded n>1 must be reproducible across engines."""
    from vllm_neuron_tpu import LLM, SamplingParams

    a1, a2 = adapters

    def build():
        return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                   max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
                   enable_prefix_caching=True, quantization="int8",
                   override_tpu_config={"quantize_lm_head": True},
                   lora_adapters={"a1": a1, "a2": a2})

    llm = build()
    greedy = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    seeded = SamplingParams(temperature=0.8, max_tokens=8, seed=7, n=2,
                            ignore_eos=True)
    prompts = [{"prompt_token_ids": [5, 77, 301, 44, 12], "lora": "a1"},
               {"prompt_token_ids": [5, 77, 301, 44, 12]},
               {"prompt_token_ids": [9, 400, 3, 250], "lora": "a2"},
               {"prompt_token_ids": [17, 88, 299]}]
    outs = llm.generate(prompts, [greedy, greedy, greedy, seeded])
    for o in outs[:3]:
        assert len(o.outputs[0].token_ids) == 8
    assert len(outs[3].outputs) == 2  # n=2 fanout
    # Same-prompt adapter vs base rows diverge (adapters are active even
    # under full quantization).
    assert outs[0].outputs[0].token_ids != outs[1].outputs[0].token_ids
    # Seeded sampling reproduces on a fresh engine (prefix cache warm vs
    # cold must not change sampled streams).
    outs2 = build().generate(prompts, [greedy, greedy, greedy, seeded])
    assert [o.outputs[0].token_ids for o in outs2] == \
        [o.outputs[0].token_ids for o in outs]
    assert outs2[3].outputs[1].token_ids == outs[3].outputs[1].token_ids
