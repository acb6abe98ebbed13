# SPDX-License-Identifier: Apache-2.0
"""Pure unit tests: scheduler policy, block pool, bucketing, tool parsing —
no model, no device (reference analogue: test/unit/test_scheduler.py
holdback/batch-cap semantics, test_platform.py config defaults)."""
import pytest

from vllm_neuron_tpu.config import (BucketingConfig, CacheConfig,
                                    EngineConfig, ModelConfig,
                                    SchedulerConfig)
from vllm_neuron_tpu.core.block_pool import BlockPool, hash_block_tokens
from vllm_neuron_tpu.core.scheduler import Scheduler
from vllm_neuron_tpu.engine.request import Request
from vllm_neuron_tpu.sampling.params import SamplingParams


def make_config(**kw):
    from transformers import LlamaConfig
    hf = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=1, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=256)
    hf.architectures = ["LlamaForCausalLM"]
    model = ModelConfig(model="__x__", tokenizer="__x__", dtype="float32",
                        max_model_len=kw.pop("max_model_len", 64),
                        hf_config=hf, load_format="random")
    return EngineConfig(
        model=model,
        cache=CacheConfig(block_size=kw.pop("block_size", 8),
                          num_blocks=kw.pop("num_blocks", None),
                          enable_prefix_caching=kw.pop(
                              "enable_prefix_caching", False)),
        scheduler=SchedulerConfig(
            max_num_seqs=kw.pop("max_num_seqs", 4),
            max_prompt_batch_size=kw.pop("max_prompt_batch_size", 2),
            max_num_batched_tokens=256,
            decode_window=kw.pop("decode_window", 4)),
        bucketing=BucketingConfig(),
    )


def req(i, n_prompt=8, **sp_kw):
    sp_kw.setdefault("max_tokens", 16)
    return Request(f"r{i}", list(range(1, n_prompt + 1)),
                   SamplingParams(**sp_kw), eos_token_id=None)


def test_prefill_priority_and_batch_cap():
    """Waiting prompts preempt decode scheduling; at most
    max_prompt_batch_size admitted per step (reference holdback policy)."""
    sched = Scheduler(make_config(max_prompt_batch_size=2, max_num_seqs=4))
    for i in range(4):
        sched.add_request(req(i))
    out = sched.schedule()
    assert out.is_prefill_step
    assert len(out.scheduled_new_reqs) == 2  # capped
    assert out.scheduled_cached_reqs.num_reqs == 0
    out2 = sched.schedule()
    assert len(out2.scheduled_new_reqs) == 2


def test_decode_window_clamps_to_budget():
    sched = Scheduler(make_config(decode_window=4))
    r = req(0, n_prompt=8, max_tokens=2)
    sched.add_request(r)
    out = sched.schedule()
    # Simulate prefill completion.
    from vllm_neuron_tpu.core.sched_output import ModelRunnerOutput
    ro = ModelRunnerOutput(req_ids=["r0"], req_id_to_index={"r0": 0},
                           sampled_token_ids=[[5]], logprobs=[None])
    sched.update_from_output(out, ro)
    out2 = sched.schedule()
    # max_tokens=2, 1 already generated -> window clamped to 1.
    assert out2.num_scheduled_tokens["r0"] == 1


def test_admission_waits_for_blocks():
    """When the pool can't hold a new prompt, admission defers (no
    preemption thrash)."""
    cfg = make_config(num_blocks=8, max_num_seqs=4, max_model_len=64)
    sched = Scheduler(cfg)
    sched.add_request(req(0, n_prompt=40))  # 5 blocks of 8
    out = sched.schedule()
    assert len(out.scheduled_new_reqs) == 1
    sched.add_request(req(1, n_prompt=40))
    out2 = sched.schedule()
    assert len(out2.scheduled_new_reqs) == 0  # only 3 blocks free


def test_block_pool_lru_and_prefix_reuse():
    pool = BlockPool(num_blocks=4, enable_caching=True)
    blocks = pool.allocate(2)
    h1 = hash_block_tokens(None, (1, 2, 3))
    pool.cache_block(blocks[0], h1)
    pool.free(blocks)
    # Revive by hash.
    hit = pool.get_cached_block(h1)
    assert hit is blocks[0]
    pool.touch(hit)
    assert pool.num_free_blocks == 3
    # Allocating the rest evicts the uncached ones first (LRU from front).
    pool.allocate(3)
    assert pool.num_free_blocks == 0
    pool.free([hit])
    # Evicting the cached block drops its hash entry.
    b = pool.allocate(1)[0]
    assert b is hit
    assert pool.get_cached_block(h1) is None


def test_bucketing_derivation_and_lookup():
    cfg = make_config(max_model_len=64)
    b = cfg.bucketing
    assert b.context_encoding_buckets[-1] == 64
    assert b.token_bucket(3) <= b.token_bucket(5)
    assert b.page_bucket(1) >= 1
    with pytest.raises(ValueError):
        b.token_bucket(10**9)


def test_tool_parser_llama3_json():
    from vllm_neuron_tpu.server.tool_parser import parse_llama3_json
    calls, content = parse_llama3_json(
        '{"name": "get_weather", "parameters": {"city": "Paris"}}')
    assert calls is not None and len(calls) == 1
    assert calls[0].name == "get_weather"
    assert '"city"' in calls[0].arguments
    assert content == ""
    # Plain text passes through.
    calls, content = parse_llama3_json("just some text")
    assert calls is None and content == "just some text"
    # python_tag prefix + multiple calls.
    calls, _ = parse_llama3_json(
        '<|python_tag|>{"name": "a", "arguments": {}};'
        '{"name": "b", "parameters": {"x": 1}}')
    assert calls is not None and [c.name for c in calls] == ["a", "b"]


def test_sampling_param_validation():
    with pytest.raises(ValueError):
        SamplingParams(temperature=-1)
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0)
    with pytest.raises(ValueError):
        SamplingParams(top_k=0)
    sp = SamplingParams(stop="END", stop_token_ids=[7])
    assert sp.stop == ["END"] and 7 in sp._all_stop_token_ids


def test_openai_protocol_parsing():
    from vllm_neuron_tpu.server.protocol import sampling_from_body
    sp = sampling_from_body({"max_tokens": 5, "temperature": 0.5,
                             "logprobs": True, "top_logprobs": 3})
    assert sp.max_tokens == 5 and sp.logprobs == 3
    with pytest.raises(ValueError):
        sampling_from_body({"temperature": "hot"})
    with pytest.raises(ValueError):
        sampling_from_body({"n": 2, "best_of": 3})


def test_min_tokens_stop_matrix():
    """check_stop_with_min_tokens behavioral matrix (reference:
    test/unit/test_scheduler.py:256-365, core/scheduler.py:130-166):
    min_tokens suppresses EOS and stop_token_ids but never the length
    caps; once satisfied, each stop fires with the right status."""
    from vllm_neuron_tpu.core.scheduler import check_stop_with_min_tokens
    from vllm_neuron_tpu.engine.request import Request, RequestStatus
    from vllm_neuron_tpu.sampling.params import SamplingParams

    EOS, STOP = 2, 99

    def req(outputs, **sp_kw):
        sp_kw.setdefault("max_tokens", 64)
        r = Request("r", [5, 6, 7], SamplingParams(temperature=0.0,
                                                   **sp_kw),
                    eos_token_id=EOS)
        for t in outputs:
            r.append_output_token_ids(t)
        return r

    # EOS before min_tokens: suppressed; after: stops.
    r = req([1, EOS], min_tokens=4)
    assert not check_stop_with_min_tokens(r, 128)
    r = req([1, 1, 1, EOS], min_tokens=4)
    assert check_stop_with_min_tokens(r, 128)
    assert r.status == RequestStatus.FINISHED_STOPPED

    # stop_token_ids before min_tokens: suppressed; after: stops with
    # stop_reason = the token.
    r = req([STOP], min_tokens=2, stop_token_ids=[STOP])
    assert not check_stop_with_min_tokens(r, 128)
    r = req([1, STOP], min_tokens=2, stop_token_ids=[STOP])
    assert check_stop_with_min_tokens(r, 128)
    assert r.stop_reason == STOP

    # max_tokens caps regardless of min_tokens.
    r = req([1, 1, 1], min_tokens=8, max_tokens=3)
    assert check_stop_with_min_tokens(r, 128)
    assert r.status == RequestStatus.FINISHED_LENGTH_CAPPED

    # max_model_len caps regardless of min_tokens (prompt 3 + 3 outputs).
    r = req([1, 1, 1], min_tokens=8)
    assert check_stop_with_min_tokens(r, 6)
    assert r.status == RequestStatus.FINISHED_LENGTH_CAPPED

    # ignore_eos: EOS never stops, even past min_tokens.
    r = req([1, 1, 1, EOS], min_tokens=1, ignore_eos=True)
    assert not check_stop_with_min_tokens(r, 128)


def test_window_shortens_when_admission_imminent():
    """TTFT policy (VERDICT-r3 #7, round-4 refinement): windows shorten
    only when the waiting request could actually be admitted soon. A
    KV-starved waiting queue keeps FULL windows (free seats do not imply
    free blocks); a predictably-near finish shortens them (that finish
    frees the KV the prefill needs)."""
    cfg = make_config(max_num_seqs=4, decode_window=4, num_blocks=8,
                      max_model_len=64, block_size=8)
    cfg.scheduler.decode_window_when_waiting = 1
    sched = Scheduler(cfg)
    for i in range(2):
        sched.add_request(req(i, n_prompt=8, max_tokens=32))
    out = sched.schedule()           # prefill both
    assert out.is_prefill_step
    for r in sched.running:
        r.num_computed_tokens = r.num_prompt_tokens
        r.append_output_token_ids(1)
    # No one waiting: full window.
    out = sched.schedule()
    assert all(n == 4 for n in out.num_scheduled_tokens.values())
    # Third request waiting with free seats but NO allocatable KV (prompt
    # bigger than the free blocks): admission cannot happen -> full window.
    sched.add_request(req(9, n_prompt=60, max_tokens=4))
    out = sched.schedule()
    if out.is_prefill_step:
        pytest.skip("prompt unexpectedly admitted; KV sizing changed")
    assert all(n == 4 for n in out.num_scheduled_tokens.values()), \
        out.num_scheduled_tokens
    # A running request one token from its max: finish (and the KV free)
    # is imminent -> window shortens.
    sched.running[0].sampling_params.max_tokens = \
        sched.running[0].num_output_tokens + 1
    out = sched.schedule()
    assert max(out.num_scheduled_tokens.values()) <= 1


def test_window_stays_full_when_batch_saturated():
    """A saturated batch with no predictable finish keeps full windows
    (throughput path) even with requests waiting."""
    cfg = make_config(max_num_seqs=2, decode_window=4, max_model_len=64)
    cfg.scheduler.decode_window_when_waiting = 1
    sched = Scheduler(cfg)
    for i in range(2):
        sched.add_request(req(i, n_prompt=8, max_tokens=40))
    sched.schedule()
    for r in sched.running:
        r.num_computed_tokens = r.num_prompt_tokens
        r.append_output_token_ids(1)
    sched.add_request(req(9, n_prompt=8, max_tokens=8))  # waits: batch full
    out = sched.schedule()
    assert not out.is_prefill_step
    assert all(n == 4 for n in out.num_scheduled_tokens.values())
    # ... but when a running request is within a window of max_tokens,
    # admission becomes imminent and the window shortens.
    sched.running[0].sampling_params.max_tokens = \
        sched.running[0].num_output_tokens + 2
    out = sched.schedule()
    assert max(out.num_scheduled_tokens.values()) <= 2


def test_cold_start_admission_burst():
    """With nothing decoding, the per-step admission cap rises to half the
    seq budget (TTFT p50: fewer per-step round trips ahead of the median
    prompt); with decodes running, the normal cap returns."""
    sched = Scheduler(make_config(max_prompt_batch_size=2, max_num_seqs=8,
                                  num_blocks=128))
    for i in range(8):
        sched.add_request(req(i, n_prompt=8))
    out = sched.schedule()
    assert len(out.scheduled_new_reqs) == 4  # max_num_seqs // 2, not 2
    # Mark the admitted four as decoding; next step uses the normal cap.
    for r in sched.running:
        r.num_computed_tokens = r.num_prompt_tokens
        r.append_output_token_ids(1)
    out2 = sched.schedule()
    assert len(out2.scheduled_new_reqs) == 2


def test_kv_starved_admission_keeps_full_windows():
    """Adaptive windows must not shorten while the waiting queue is blocked
    on KV blocks: free decode SEATS do not imply free KV, and shortened
    windows would multiply host syncs with no admission possible until a
    finish frees blocks (round-4 review finding)."""
    cfg = make_config(num_blocks=8, max_num_seqs=4, max_model_len=64,
                      decode_window=4)
    sched = Scheduler(cfg)
    sched.add_request(req(0, n_prompt=40, max_tokens=16))  # 5 of 8 blocks
    out = sched.schedule()
    from vllm_neuron_tpu.core.sched_output import ModelRunnerOutput
    ro = ModelRunnerOutput(req_ids=["r0"], req_id_to_index={"r0": 0},
                           sampled_token_ids=[[5]], logprobs=[None])
    sched.update_from_output(out, ro)
    sched.add_request(req(1, n_prompt=40))  # needs 5 blocks, only 3 free
    out2 = sched.schedule()
    assert len(out2.scheduled_new_reqs) == 0
    assert sched._kv_starved
    # Decode window stays FULL despite the (unadmittable) waiting request.
    assert out2.num_scheduled_tokens["r0"] == 4
    # Freeing blocks clears the starvation and admission resumes.
    sched.abort_request("r0")
    assert not sched._kv_starved
    out3 = sched.schedule()
    assert len(out3.scheduled_new_reqs) == 1
