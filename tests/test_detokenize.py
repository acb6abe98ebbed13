# SPDX-License-Identifier: Apache-2.0
"""Text-path tests with a real (tiny, trained-on-the-fly) tokenizer:
incremental detokenization, stop strings, chat template serving
(reference analogues: vLLM detokenizer/stop-string handling the plugin
inherits, SURVEY.md §2.2 V10; tool-calling chat template serving,
configs.py:118-135)."""
import json
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_tokenized_model(tmp_path_factory, tiny_llama_dir):
    """tiny_llama checkpoint + a byte-level BPE tokenizer with vocab matching
    the model (512), plus a minimal chat template."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512, special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = ["the quick brown fox jumps over the lazy dog " * 20,
              "hello world this is a test of the tokenizer " * 20]
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>")
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{% endfor %}assistant:")
    path = tmp_path_factory.mktemp("tiny_tok")
    fast.save_pretrained(path)
    # Pair with the tiny model weights (vocab 512 matches).
    import shutil, os, glob
    for f in glob.glob(f"{tiny_llama_dir}/*"):
        if not os.path.basename(f).startswith("tokenizer"):
            shutil.copy(f, path)
    return str(path)


def test_incremental_detokenization_matches_full(tiny_tokenized_model):
    from vllm_neuron_tpu import LLM, SamplingParams

    llm = LLM(model=tiny_tokenized_model, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16)
    out = llm.generate("the quick brown",
                       SamplingParams(temperature=0.0, max_tokens=12,
                                      ignore_eos=True))[0]
    comp = out.outputs[0]
    full = llm.tokenizer.decode(comp.token_ids, skip_special_tokens=True)
    assert comp.text == full, f"incremental {comp.text!r} vs full {full!r}"
    assert len(comp.token_ids) == 12


def test_stop_string_truncates(tiny_tokenized_model):
    from vllm_neuron_tpu import LLM, SamplingParams

    llm = LLM(model=tiny_tokenized_model, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=16)
    base = llm.generate("hello world",
                        SamplingParams(temperature=0.0, max_tokens=16,
                                       ignore_eos=True))[0]
    text = base.outputs[0].text
    if len(text) < 6:
        pytest.skip("generation too short to carve a stop string")
    stop = text[3:6]
    out = llm.generate("hello world",
                       SamplingParams(temperature=0.0, max_tokens=16,
                                      ignore_eos=True, stop=stop))[0]
    comp = out.outputs[0]
    assert stop not in comp.text or comp.text.index(stop) >= len(comp.text) - len(stop)
    assert len(comp.token_ids) <= len(base.outputs[0].token_ids)


def test_chat_completions_with_template(tiny_tokenized_model):
    """Chat endpoint applies the template and returns a message."""
    import asyncio
    import socket
    import threading
    import time
    import urllib.request

    from vllm_neuron_tpu.engine.async_llm import AsyncEngine
    from vllm_neuron_tpu.engine.llm import build_engine_config
    from vllm_neuron_tpu.server.api_server import OpenAIServer

    from transformers import AutoTokenizer

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    config = build_engine_config(tiny_tokenized_model, dtype="float32",
                                 max_model_len=128, max_num_seqs=2,
                                 block_size=16)
    tokenizer = AutoTokenizer.from_pretrained(tiny_tokenized_model)
    ready = threading.Event()
    holder = {}

    def run():
        async def main():
            engine = AsyncEngine(config, tokenizer=tokenizer)
            engine.start(asyncio.get_running_loop())
            holder["engine"] = engine
            srv = OpenAIServer(engine, served_model_name="tiny")
            http = await srv.app.serve("127.0.0.1", port)
            ready.set()
            async with http:
                await http.serve_forever()
        asyncio.run(main())

    threading.Thread(target=run, daemon=True).start()
    assert ready.wait(60)
    time.sleep(0.2)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({
            "model": "tiny",
            "messages": [{"role": "user", "content": "say something"}],
            "max_tokens": 8,
            "temperature": 0.0,
            "ignore_eos": True,
        }).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert out["usage"]["completion_tokens"] == 8
    holder["engine"].shutdown()
