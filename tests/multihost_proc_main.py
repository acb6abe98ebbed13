# SPDX-License-Identifier: Apache-2.0
"""Per-process entry point for the REAL two-process multi-host test.

Launched as a subprocess by test_multihost_2proc.py — once per "host", each
with 4 virtual CPU devices (XLA_FLAGS set by the parent). Exercises the full
multi-host serving stack end-to-end with nothing monkeypatched:
``jax.distributed.initialize`` over a localhost coordinator (gloo CPU
collectives), an 8-device global mesh spanning both processes, lazy sharded
checkpoint loading (models/sharded_weights.py — each host reads only its
local shards), leader-side scheduling with ``broadcast_one_to_all`` dispatch
replication, and the follower lockstep loop (parallel/multihost.py).

Reference contract: the driver worker returns output, non-driver workers
return None and replay the same program
(/root/reference/vllm_neuron/worker/neuron_worker.py:68-69, :106-121).

Usage: python tests/multihost_proc_main.py <pid> <nprocs> <port> <out_json>
       <ckpt_dir> [spec]

With the optional ``spec`` flag both hosts enable multi-round fused Eagle
speculation (ckpt_dir + "_eagle" draft, K=2 W=2): the leader's
run_spec_decode_multi / run_prefill_spec dispatches replicate to the
follower through the same bundle broadcast as dense steps (VERDICT r4 #2 —
speculation in the multi-chip correctness surface).
"""
import json
import sys


def main() -> None:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, out_path, ckpt = sys.argv[3], sys.argv[4], sys.argv[5]
    spec_cfg = None
    if len(sys.argv) > 6 and sys.argv[6] == "spec":
        import os as _os
        spec_cfg = {"model": ckpt.rstrip("/") + "_eagle",
                    "num_speculative_tokens": 2, "method": "eagle",
                    "num_fused_rounds": 2}

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from vllm_neuron_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)

    from vllm_neuron_tpu.parallel import multihost
    assert multihost.num_hosts() == nprocs
    assert jax.device_count() == 4 * nprocs, jax.devices()

    import numpy as np
    prompts = _prompts(ckpt)

    if multihost.is_leader():
        from vllm_neuron_tpu import LLM, SamplingParams
        llm = LLM(model=ckpt, skip_tokenizer_init=True, dtype="float32",
                  max_model_len=128, max_num_seqs=4, block_size=16,
                  tensor_parallel_size=4 * nprocs,
                  speculative_config=spec_cfg,
                  override_tpu_config={
                      "context_encoding_buckets": [64],
                      "token_generation_buckets": [4],
                  })
        # The sharded lazy loader must actually be in play (not the eager
        # host-side loader): multi-host forces it for the dense family.
        runner = llm.engine.worker.model_runner
        assert runner._use_sharded_load(), "sharded load path not taken"
        sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
        outs = llm.generate(
            [{"prompt_token_ids": p} for p in prompts],
            [sp] * len(prompts))
        tokens = [out.outputs[0].token_ids for out in outs]
        if spec_cfg is not None:
            fns = llm.engine.worker.model_runner.executor._fns
            assert any(k[0] == "spec_decode_multi" for k in fns), \
                "spec enabled but the fused multi-round program never ran"
        multihost.broadcast_shutdown()
        with open(out_path, "w") as f:
            json.dump({"tokens": tokens}, f)
        print("LEADER_OK", flush=True)
    else:
        from vllm_neuron_tpu.engine.llm import build_engine_config
        from vllm_neuron_tpu.parallel.multihost import FollowerLoop
        from vllm_neuron_tpu.worker.worker import Worker
        config = build_engine_config(
            ckpt, dtype="float32", max_model_len=128, max_num_seqs=4,
            block_size=16, tensor_parallel_size=4 * nprocs,
            speculative_config=spec_cfg,
            override_tpu_config={
                "context_encoding_buckets": [64],
                "token_generation_buckets": [4],
            })
        config.model.hf_config  # force config load before device work
        worker = Worker(config)
        worker.init_device()
        worker.load_model()
        FollowerLoop(worker).run_forever()
        print("FOLLOWER_OK", flush=True)


def _prompts(ckpt: str):
    import numpy as np
    import os
    val = np.load(os.path.join(ckpt, "val_tokens.npy"))
    # Three prompts of distinct lengths (exercise ragged prefill + a full
    # decode batch), drawn from the trained model's validation stream.
    return [val[0:19].tolist(), val[100:137].tolist(), val[200:248].tolist()]


if __name__ == "__main__":
    main()
