# SPDX-License-Identifier: Apache-2.0
"""Eagle-V1 fused speculative decoding.

Key invariant (greedy acceptance): output WITH speculation must be
token-identical to output WITHOUT — drafts only change speed, never content
(reference: test/tiny/test_eagle_speculative_decoding.py drives the same
greedy equivalence through goldens)."""
import numpy as np
import pytest

from tests.conftest import hf_greedy
from vllm_neuron_tpu import LLM, SamplingParams


def test_spec_greedy_identical_to_baseline(tiny_llama_dir, tiny_eagle_dir):
    prompts = [
        [5, 77, 301, 44, 12, 99, 8],
        [401, 3, 3, 17],
        [250, 251, 252, 253, 254, 255, 256, 100, 101],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)

    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    base_out = base.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 3,
                                   "method": "eagle"})
    spec_out = spec.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    for p, b, s in zip(prompts, base_out, spec_out):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids, \
            f"prompt {p}: spec {s.outputs[0].token_ids} " \
            f"vs base {b.outputs[0].token_ids}"
        assert s.outputs[0].token_ids == \
            hf_greedy(tiny_llama_dir, p, 16)[:len(s.outputs[0].token_ids)]

    # The fused spec programs actually ran.
    fns = spec.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode" for k in fns)
    assert any(k[0] == "prefill_spec" for k in fns)

    # Acceptance counters surface through engine metrics (reference
    # analogue: vLLM spec-decode acceptance metrics; VERDICT r2 next #8).
    snap = spec.engine.metrics.snapshot()
    assert snap["spec_decode_rounds"] > 0
    assert snap["spec_decode_draft_tokens"] >= snap["spec_decode_rounds"]
    assert 0 <= snap["spec_decode_accepted_tokens"] <= \
        snap["spec_decode_draft_tokens"]
    rate = snap["spec_decode_acceptance_rate"]
    assert rate == snap["spec_decode_accepted_tokens"] / \
        snap["spec_decode_draft_tokens"]
    # Sanity on the arithmetic: every accepted draft became an output
    # token; outputs = rounds (bonus tokens) + accepted + prefill tokens.
    total_out = sum(len(o.outputs[0].token_ids) for o in spec_out)
    assert snap["spec_decode_accepted_tokens"] <= total_out


def test_spec_non_greedy_keeps_speculating(tiny_llama_dir, tiny_eagle_dir):
    """Sampled requests run through the fused spec path too (rejection
    acceptance; tests/test_spec_sampling.py covers the distribution)."""
    spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=2, block_size=16, skip_tokenizer_init=True,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 3})
    out = spec.generate({"prompt_token_ids": [4, 5, 6, 7]},
                        SamplingParams(temperature=0.9, max_tokens=8,
                                       ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 8
    fns = spec.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode" for k in fns)


def test_spec_with_prefix_caching_greedy_exact(tiny_llama_dir,
                                               tiny_eagle_dir):
    """Speculation composes with prefix caching: draft KV lives at the
    target's block-table slots, so cache hits restore draft context too.
    Requests sharing a long prefix must stay greedy-exact after a hit."""
    shared = [7, 21, 93, 4, 55, 18, 200, 30, 31, 32, 33, 34, 61, 62, 63,
              64, 65, 66, 90, 91]
    prompts = [shared + [5], shared + [9, 10], shared + [120]]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, block_size=4, enable_prefix_caching=True,
              skip_tokenizer_init=True,
              speculative_config={"model": tiny_eagle_dir,
                                  "num_speculative_tokens": 3,
                                  "method": "eagle"})
    assert llm.config.cache.enable_prefix_caching  # not force-disabled
    # Serialize so the later prompts actually hit the earlier one's blocks.
    for p in prompts:
        out = llm.generate({"prompt_token_ids": p}, sp)[0]
        ref = hf_greedy(tiny_llama_dir, p, 12)
        got = list(out.outputs[0].token_ids)
        assert got == ref[:len(got)], f"prompt {p}: {got} vs {ref}"
    kvm = llm.engine.scheduler.kv_manager
    assert kvm.block_pool.hits > 0, "no prefix-cache hit exercised"
    fns = llm.engine.worker.model_runner.executor._fns
    assert any(k[0] == "prefill_spec" for k in fns)


def test_spec_with_quantized_target(tiny_llama_dir, tiny_eagle_dir):
    """Speculation composes with a quantized target: int8 spec greedy ==
    int8 non-spec greedy (acceptance is exact prefix match under greedy,
    so the quantized target's own distribution is the oracle)."""
    prompts = [[5, 77, 301, 44, 12, 99, 8], [401, 3, 3, 17]]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    kw = dict(dtype="float32", max_model_len=128, max_num_seqs=4,
              block_size=16, skip_tokenizer_init=True, quantization="int8")

    base = LLM(model=tiny_llama_dir, **kw)
    base_out = base.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))
    spec = LLM(model=tiny_llama_dir,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 3,
                                   "method": "eagle"}, **kw)
    spec_out = spec.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))
    for b, s in zip(base_out, spec_out):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids
    assert any(k[0] == "spec_decode"
               for k in spec.engine.worker.model_runner.executor._fns)


def test_spec_multi_round_greedy_identical(tiny_llama_dir, tiny_eagle_dir):
    """W fused rounds per dispatch (device-resident acceptance state —
    positions, kv lens, slot math advance on device between rounds) must
    produce greedy output token-identical to the non-speculative baseline,
    exactly like the single-round program."""
    prompts = [
        [5, 77, 301, 44, 12, 99, 8],
        [401, 3, 3, 17],
        [250, 251, 252, 253, 254, 255, 256, 100, 101],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)

    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    base_out = base.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 3,
                                   "method": "eagle",
                                   "num_fused_rounds": 4})
    spec_out = spec.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    for p, b, s in zip(prompts, base_out, spec_out):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids, \
            f"prompt {p}: multi-spec {s.outputs[0].token_ids} " \
            f"vs base {b.outputs[0].token_ids}"

    fns = spec.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode_multi" for k in fns)
    snap = spec.engine.metrics.snapshot()
    assert snap["spec_decode_rounds"] > 0
    assert snap["spec_decode_acceptance_rate"] >= 0.0


def test_spec_multi_round_crosses_page_bucket(tiny_llama_dir,
                                              tiny_eagle_dir):
    """A multi-round window that CROSSES a page-bucket boundary must stay
    token-identical to the baseline: the host sizes the dispatch's page
    bucket for the full W*(K+1) window (a one-round bucket would let later
    rounds' page lookups clip into the last listed page and overwrite live
    context KV — round-4 review finding). Prompt 55 @ block 16: nct=55
    starts in the 4-page (64-token) bucket; W=4 x (K+1)=16 positions cross
    into pages 4-5."""
    rng = np.random.default_rng(6)
    prompt = rng.integers(1, 512, size=55).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)

    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    b = base.generate({"prompt_token_ids": prompt}, sp)[0]

    spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 3,
                                   "method": "eagle",
                                   "num_fused_rounds": 4})
    s = spec.generate({"prompt_token_ids": prompt}, sp)[0]
    assert s.outputs[0].token_ids == b.outputs[0].token_ids


def test_spec_tp2_greedy_exact(tiny_llama_dir, tiny_eagle_dir):
    """Fused speculation UNDER A MESH (VERDICT r4 #2): the reference's
    fused Eagle runs inside its TP graph (model_loader.py:243-303 — the
    FusedSpecNeuronConfig compiles into the TP NEFF); here the spec
    programs' in-program slot/position math must compose with shard_map /
    GSPMD partitioning. tp=2 spec output must be token-identical to the
    unsharded non-spec baseline."""
    prompts = [
        [5, 77, 301, 44, 12, 99, 8],
        [401, 3, 3, 17],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)

    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    base_out = base.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               tensor_parallel_size=2,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 3,
                                   "method": "eagle"})
    spec_out = spec.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    for p, b, s in zip(prompts, base_out, spec_out):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids, \
            f"prompt {p}: tp2 spec {s.outputs[0].token_ids} " \
            f"vs base {b.outputs[0].token_ids}"
    fns = spec.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode" for k in fns)
    assert any(k[0] == "prefill_spec" for k in fns)


def test_spec_tp2_multi_round_greedy_exact(tiny_llama_dir, tiny_eagle_dir):
    """Multi-round fused speculation (num_fused_rounds=W) under tp=2: the
    device-resident acceptance state (positions, kv lens, slot tables
    computed in-program from the page table) is the riskiest composition
    with GSPMD — pin it token-identical to the unsharded baseline."""
    prompts = [
        [5, 77, 301, 44, 12, 99, 8],
        [250, 251, 252, 253, 254, 255, 256, 100, 101],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)

    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    base_out = base.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
               tensor_parallel_size=2,
               speculative_config={"model": tiny_eagle_dir,
                                   "num_speculative_tokens": 2,
                                   "method": "eagle",
                                   "num_fused_rounds": 2})
    spec_out = spec.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    for p, b, s in zip(prompts, base_out, spec_out):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids, \
            f"prompt {p}: tp2 multi-spec {s.outputs[0].token_ids} " \
            f"vs base {b.outputs[0].token_ids}"
    fns = spec.engine.worker.model_runner.executor._fns
    assert any(k[0] == "spec_decode_multi" for k in fns)


def test_spec_verify_kernel_route_greedy_exact(tiny_llama_dir,
                                               tiny_eagle_dir, monkeypatch):
    """The multi-token paged verify KERNEL route (kind='spec_verify' ->
    decode_paged_attention_verify) must keep greedy spec output
    token-identical to baseline. Off-TPU the dispatcher defaults to the
    dense path; forcing backend='pallas' runs the kernel in interpret
    mode through the FULL fused spec programs (single-round and
    multi-round)."""
    from vllm_neuron_tpu.ops import ragged_attention as ra

    prompts = [
        [5, 77, 301, 44, 12, 99, 8],
        [250, 251, 252, 253, 254, 255, 256, 100, 101],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

    base = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, block_size=16, skip_tokenizer_init=True)
    base_out = base.generate([{"prompt_token_ids": p} for p in prompts],
                             [sp] * len(prompts))

    monkeypatch.setattr(ra, "default_backend", lambda: "pallas")
    for rounds in (1, 2):
        spec = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
                   max_num_seqs=4, block_size=16, skip_tokenizer_init=True,
                   speculative_config={"model": tiny_eagle_dir,
                                       "num_speculative_tokens": 3,
                                       "method": "eagle",
                                       "num_fused_rounds": rounds})
        spec_out = spec.generate(
            [{"prompt_token_ids": p} for p in prompts],
            [sp] * len(prompts))
        for p, b, s in zip(prompts, base_out, spec_out):
            assert s.outputs[0].token_ids == b.outputs[0].token_ids, \
                f"W={rounds} prompt {p}: {s.outputs[0].token_ids} " \
                f"vs {b.outputs[0].token_ids}"
