#!/bin/bash
# One TPU-up-window execution chain: runs every pending measurement
# back-to-back while the flaky axon tunnel is alive.  Each step is
# timeout-bounded so one hang cannot eat the window.
# Usage: bash tools/tpu_chain.sh [outdir]   (default /tmp/tpu_runs)
set -u
OUT=${1:-/tmp/tpu_runs}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
  # probe tunnel health between steps; bail if dead so logs say why
  if ! timeout 90 python -c "import jax,jax.numpy as j;(j.ones((8,8))@j.ones((8,8))).sum().block_until_ready()" >/dev/null 2>&1; then
    echo "=== tunnel dead after $name, aborting chain $(date +%H:%M:%S)" \
      | tee -a "$OUT/chain.log"
    exit 9
  fi
}

run bench          420 python bench.py
run micro_sparse   900 python tools/micro_sparse_update.py
run roofline       900 python tools/roofline.py
run measure_eval   700 python tools/measure_eval.py
run probe_pipeline 900 python tools/probe_pipeline.py
run train_file    1500 python -m rec_now_tpu.train --model dcnv2 \
    --data-file /root/data/criteo_synth.tsv --scan-window 5 \
    --steps 600 --batch-size 8192 --log-every 100 --eval-batches 8 \
    --eval-mode device
run train_mem     1200 python -m rec_now_tpu.train --model dcnv2 \
    --scan-window 5 --steps 600 --batch-size 8192 --log-every 100 \
    --eval-batches 8 --eval-mode device
echo "=== chain complete $(date +%H:%M:%S)" | tee -a "$OUT/chain.log"
