# SPDX-License-Identifier: Apache-2.0
"""Engine-behavior tests: stop conditions across decode windows, min_tokens,
preemption/resumption, aborts, sampling features (reference analogues:
test/unit/test_scheduler.py min_tokens matrix, test/tiny/test_dynamic_sampling
determinism/diversity checks, test_offline_e2e.py:110-160 min_tokens-beats-EOS).
"""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)


def test_stop_token_mid_window(llm, tiny_llama_dir):
    """A stop token hit inside a fused decode window must end the request
    there, discarding window overshoot."""
    prompt = [5, 77, 301, 44, 12, 99, 8]
    ref = hf_greedy(tiny_llama_dir, prompt, 24)
    stop_tok = ref[5]
    sp = SamplingParams(temperature=0.0, max_tokens=24,
                        stop_token_ids=[stop_tok], ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    got = out.outputs[0].token_ids
    assert got == ref[:6], f"{got} vs {ref[:6]}"
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].stop_reason == stop_tok


def test_max_tokens_not_window_multiple(llm, tiny_llama_dir):
    """max_tokens that is not a multiple of the decode window must be hit
    exactly."""
    prompt = [401, 3, 3, 17]
    for mt in (1, 3, 7, 11):
        sp = SamplingParams(temperature=0.0, max_tokens=mt, ignore_eos=True)
        out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
        assert len(out.outputs[0].token_ids) == mt
        assert out.outputs[0].token_ids == \
            hf_greedy(tiny_llama_dir, prompt, mt)
        assert out.outputs[0].finish_reason == "length"


def test_min_tokens_beats_stop_token(llm, tiny_llama_dir):
    """min_tokens suppresses stop tokens until satisfied (reference:
    check_stop_with_min_tokens, core/scheduler.py:130-166)."""
    prompt = [5, 77, 301, 44, 12, 99, 8]
    ref = hf_greedy(tiny_llama_dir, prompt, 12)
    stop_tok = ref[2]
    sp = SamplingParams(temperature=0.0, max_tokens=12, min_tokens=8,
                        stop_token_ids=[stop_tok], ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    got = out.outputs[0].token_ids
    assert len(got) >= 8
    # Greedy continuation is unchanged by the suppressed stop.
    assert got[:8] == ref[:8]


def test_preemption_resume_correctness(tiny_llama_dir):
    """A KV pool too small for all requests forces preemption; preempted
    requests must resume and still produce exact greedy continuations."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, block_size=16, num_blocks=12,
              skip_tokenizer_init=True)
    prompts = [[i + 3, i + 9, i + 20, i + 1] for i in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                        [sp] * 4)
    for p, out in zip(prompts, outs):
        # HF generate stops at EOS; we run with ignore_eos, so compare the
        # HF-length prefix.
        ref = hf_greedy(tiny_llama_dir, p, 24)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"


def test_seeded_sampling_reproducible(llm):
    prompt = [250, 251, 252, 253]
    sp = SamplingParams(temperature=0.8, seed=42, max_tokens=10,
                        ignore_eos=True)
    a = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    b = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_mixed_host_device_batch_split(tiny_llama_dir):
    """One host-sampling request (seeded) must NOT collapse the device
    rows' decode window (the split path, model_runner._run_decode): greedy
    rows stay exact vs HF, and the seeded row matches a host-only run."""
    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    greedy_prompts = [[5, 77, 301, 44, 12], [401, 3, 3, 17]]
    seeded_prompt = [250, 251, 252, 253]
    sp_g = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    sp_s = SamplingParams(temperature=0.8, seed=42, max_tokens=12,
                          ignore_eos=True)
    outs = llm.generate(
        [{"prompt_token_ids": p} for p in greedy_prompts] +
        [{"prompt_token_ids": seeded_prompt}],
        [sp_g, sp_g, sp_s])
    for p, out in zip(greedy_prompts, outs[:2]):
        ref = hf_greedy(tiny_llama_dir, p, 12)
        assert out.outputs[0].token_ids[:len(ref)] == ref
    # The seeded row must match a solo (host-sampled, unsplit) run.
    solo = llm.generate({"prompt_token_ids": seeded_prompt}, sp_s)[0]
    assert outs[2].outputs[0].token_ids == solo.outputs[0].token_ids
    assert len(outs[2].outputs[0].token_ids) == 12


def test_logprobs_host_path(llm):
    prompt = [7, 8, 9, 10]
    sp = SamplingParams(temperature=0.0, max_tokens=5, logprobs=3,
                        ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    comp = out.outputs[0]
    assert comp.logprobs is not None and len(comp.logprobs) == 5
    for lp_map in comp.logprobs:
        assert 1 <= len(lp_map) <= 4  # sampled + up to 3 top
        for v in lp_map.values():
            assert v <= 0.0


def test_n_greater_1_diversity(llm):
    prompt = [30, 31, 32, 33]
    sp = SamplingParams(n=4, temperature=1.0, top_k=50, seed=7,
                        max_tokens=8, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    assert len(out.outputs) == 4
    seqs = {tuple(c.token_ids) for c in out.outputs}
    assert len(seqs) > 1, "children should diverge"


def test_temperature_zero_equals_topk1(llm):
    prompt = [90, 91, 92]
    g = llm.generate({"prompt_token_ids": prompt},
                     SamplingParams(temperature=0.0, max_tokens=8,
                                    ignore_eos=True))[0]
    k1 = llm.generate({"prompt_token_ids": prompt},
                      SamplingParams(top_k=1, temperature=0.7, max_tokens=8,
                                     ignore_eos=True))[0]
    assert g.outputs[0].token_ids == k1.outputs[0].token_ids


def test_async_decode_pipelining_exact(tiny_llama_dir):
    """Optimistic cross-window pipelining must be token-identical to the
    synchronous path, including stop-condition mispredictions."""
    sp_list = [
        SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True),
        SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True),
    ]
    prompts = [[5, 77, 301, 44], [250, 251, 252]]
    llm_async = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                    max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
                    override_tpu_config={"async_decode": True})
    outs = llm_async.generate([{"prompt_token_ids": p} for p in prompts],
                              sp_list)
    for p, out, sp in zip(prompts, outs, sp_list):
        ref = hf_greedy(tiny_llama_dir, p, sp.max_tokens)
        got = out.outputs[0].token_ids[:len(ref)]
        assert got == ref, f"prompt {p}: {got} vs {ref}"
    # A stop token mid-window forces a misprediction; output must still be
    # exact.
    ref = hf_greedy(tiny_llama_dir, prompts[0], 20)
    stop_tok = ref[4]
    out = llm_async.generate(
        {"prompt_token_ids": prompts[0]},
        SamplingParams(temperature=0.0, max_tokens=20,
                       stop_token_ids=[stop_tok], ignore_eos=True))[0]
    assert out.outputs[0].token_ids == ref[:5]


def test_abort_midflight(llm):
    engine = llm.engine
    sp = SamplingParams(temperature=0.0, max_tokens=50, ignore_eos=True)
    engine.add_request("abort-me", [4, 5, 6, 7], sp)
    engine.step()  # prefill
    engine.step()  # one decode window
    engine.abort_request("abort-me")
    assert not any(r.req_id == "abort-me"
                   for r in engine.scheduler.running)
    # Pool fully freed for future requests.
    out = llm.generate({"prompt_token_ids": [4, 5, 6, 7]},
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 4


def test_packed_h2d_window_exact(tiny_llama_dir):
    """VLLM_TPU_PACKED_H2D=1 (single packed transfer + device unpack per
    decode window) must be bit-exact with the per-array path."""
    import os

    from vllm_neuron_tpu.worker import executor as ex

    prompts = [[5, 77, 301, 44, 12], list(range(300, 340)), [7, 8, 9]]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

    def run():
        llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
        outs = llm.generate([{"prompt_token_ids": p} for p in prompts],
                            [sp] * len(prompts))
        return [o.outputs[0].token_ids for o in outs]

    base = run()
    os.environ["VLLM_TPU_PACKED_H2D"] = "1"
    ex._packed_h2d.cache_clear()
    try:
        packed = run()
    finally:
        del os.environ["VLLM_TPU_PACKED_H2D"]
        ex._packed_h2d.cache_clear()
    assert packed == base, f"{packed} vs {base}"
