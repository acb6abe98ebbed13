# SPDX-License-Identifier: Apache-2.0
"""AsyncEngine concurrency: many simultaneous streaming requests through
the asyncio surface (the serving path under load)."""
import asyncio

import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu.engine.async_llm import AsyncEngine
from vllm_neuron_tpu.engine.llm import build_engine_config
from vllm_neuron_tpu.sampling.params import SamplingParams


def test_concurrent_streams_exact(tiny_llama_dir):
    config = build_engine_config(tiny_llama_dir, dtype="float32",
                                 max_model_len=128, max_num_seqs=4,
                                 block_size=16)
    engine = AsyncEngine(config, tokenizer=None)
    prompts = [[5 + i, 77, 301, 44] for i in range(10)]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True,
                        detokenize=False)

    async def collect(p):
        deltas = 0
        last = None
        async for out in engine.generate(p, sp):
            deltas += 1
            last = out
        return last, deltas

    async def main():
        engine.start(asyncio.get_running_loop())
        results = await asyncio.gather(*[collect(p) for p in prompts])
        return results

    results = asyncio.run(main())
    engine.shutdown()
    for p, (out, deltas) in zip(prompts, results):
        assert out.finished
        assert deltas >= 2, "streaming yielded no incremental deltas"
        ref = hf_greedy(tiny_llama_dir, p, 10)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"


def test_cancel_aborts_request(tiny_llama_dir):
    config = build_engine_config(tiny_llama_dir, dtype="float32",
                                 max_model_len=128, max_num_seqs=2,
                                 block_size=16)
    engine = AsyncEngine(config, tokenizer=None)
    sp = SamplingParams(temperature=0.0, max_tokens=100, ignore_eos=True,
                        detokenize=False)

    async def main():
        engine.start(asyncio.get_running_loop())
        agen = engine.generate([3, 4, 5, 6], sp, request_id="cancel-me")
        await agen.__anext__()  # first delta
        await agen.aclose()  # cancel the stream
        await asyncio.sleep(0.3)
        # The engine must drop the request and go idle.
        for _ in range(50):
            if not engine.engine.has_unfinished_requests():
                break
            await asyncio.sleep(0.1)
        assert not engine.engine.has_unfinished_requests()

    asyncio.run(main())
    engine.shutdown()
