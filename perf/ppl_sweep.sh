#!/bin/bash
cd /root/repo
CKPT=/root/repo/ckpt_tinypy
TOK=$CKPT/val_tokens.npy
OUT=/tmp/ppl_results.jsonl
: > $OUT
run() {
  name=$1; shift
  echo "== $name ==" >&2
  r=$(python -m vllm_neuron_tpu.tools.eval_ppl --model $CKPT --tokens $TOK \
      --window 1024 --max-tokens 65536 "$@" 2>>/tmp/ppl.err)
  echo "{\"config\": \"$name\", ${r:1}" >> $OUT
}
run bf16
run int8 --quantization int8
run fp8  --quantization fp8
run fp8kv --kv-cache-dtype fp8
VLLM_TPU_W8A8_MIN_ROWS=256 run w8a8 --quantization int8
run int4 --quantization int4
run int4g64 --quantization int4 --int4-group-size 64
run int4g256 --quantization int4 --int4-group-size 256
run int4fp8kv --quantization int4 --kv-cache-dtype fp8
cat $OUT
