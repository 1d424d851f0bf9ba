#!/bin/bash
# Round-4 TPU-window chain: every pending measurement back-to-back
# while the axon tunnel is alive.  Timeout-bounded per step.
# ALL training/bench steps use the same production wire (u8 dense) so
# the round's artifacts are one consistent dataset (ADVICE r3).
# Usage: bash tools/tpu_chain_r4.sh [outdir]   (default /tmp/tpu_r4)
set -u
OUT=${1:-/tmp/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_WIRE_DENSE=u8
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
run probe_fused    700 python tools/probe_fused_update.py
run roofline       900 python tools/roofline.py
run measure_eval   700 python tools/measure_eval.py
run serving        700 python tools/measure_serving.py
run train_mem      900 python -m rec_now_tpu.train --model dcnv2 \
    --scan-window 5 --steps 600 --batch-size 8192 --log-every 100 \
    --eval-batches 8 --eval-mode device --wire-dense-mode u8
run train_file    1500 python -m rec_now_tpu.train --model dcnv2 \
    --data-file /tmp/criteo_synth.tsv --scan-window 5 \
    --steps 600 --batch-size 8192 --log-every 100 --eval-batches 8 \
    --eval-mode device --wire-dense-mode u8
run bench_all     2400 python bench_all.py
echo "=== chain complete $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
