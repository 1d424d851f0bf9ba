#!/bin/bash
# Round-3 TPU-window chain: every pending measurement back-to-back
# while the axon tunnel is alive.  Timeout-bounded per step.
# Usage: bash tools/tpu_chain_r3.sh [outdir]   (default /tmp/tpu_r3)
set -u
OUT=${1:-/tmp/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  if ! timeout 90 python -c "import jax,jax.numpy as j;(j.ones((8,8))@j.ones((8,8))).sum().block_until_ready()" >/dev/null 2>&1; then
    echo "=== tunnel dead after $name, aborting $(date +%H:%M:%S)" \
      | tee -a "$OUT/chain.log"
    exit 9
  fi
}

run bench          500 python bench.py
run roofline       900 python tools/roofline.py
run measure_eval   700 python tools/measure_eval.py
run train_file    1500 python -m rec_now_tpu.train --model dcnv2 \
    --data-file /tmp/criteo_synth.tsv --scan-window 5 \
    --steps 600 --batch-size 8192 --log-every 100 --eval-batches 8 \
    --eval-mode device
run train_mem      900 python -m rec_now_tpu.train --model dcnv2 \
    --scan-window 5 --steps 600 --batch-size 8192 --log-every 100 \
    --eval-batches 8 --eval-mode device
run bench_all     1500 python bench_all.py
echo "=== chain complete $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
