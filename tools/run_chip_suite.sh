#!/bin/bash
# Sequential on-chip validation suite (ONE tunnel process at a time).
# Each step bounded by timeout; failures don't stop the suite.
# Usage: bash tools/run_chip_suite.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_results}
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  timeout "$t" "$@" > "$OUT/$name.out" 2> "$OUT/$name.log"
  echo "--- rc=$? $name done ($(date +%H:%M:%S))" >&2
}

# 1. 7B/131k headline (w8a8+int4)
run bench_7b_131k 3300 env BENCH_CHILD=1 BENCH_MODEL=qwen2.5-7b \
    BENCH_CTX=131072 BENCH_WEIGHT_QUANT=w8a8 BENCH_KV_QUANT=int4 \
    BENCH_EMBED_QUANT=int8 python bench.py

# 3. w8a8-only at 32k (VERDICT r1 weak #5: vs_baseline must be > 1.0)
run bench_7b_32k_w8a8 2400 env BENCH_CHILD=1 BENCH_MODEL=qwen2.5-7b \
    BENCH_CTX=32768 BENCH_WEIGHT_QUANT=w8a8 python bench.py

# 4. batched serving aggregate (VERDICT r1 item 8: > 4x single-stream)
run bench_serving 3000 python tools/bench_serving.py 8

# 5. on-chip Pallas kernel lane (incl. new q8 + w4a8 kernels)
run tpu_kernel_lane 2400 env KVZIP_TPU_TESTS=1 \
    python -m pytest tests/test_tpu_kernels.py -m tpu -q -n 0

echo "suite done" >&2
