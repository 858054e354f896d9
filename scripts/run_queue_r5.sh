#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items 3, 5, 7, 8 + bench refresh).
# Single-tenant chip: jobs run strictly serialized with a 90 s drain gap
# between processes (CLAUDE.md: launching a TPU client while the previous
# one is still dying wedges the new one at first compile).
# Usage: bash scripts/run_queue_r5.sh [start_step]
set -u
cd /root/repo
mkdir -p test_results
STATUS=test_results/queue_r5.status
START=${1:-0}
: > "$STATUS"

run_job() {  # run_job <idx> <name> <log> <timeout_s> <cmd...>
  local idx=$1 name=$2 log=$3 to=$4; shift 4
  if [ "$idx" -lt "$START" ]; then echo "SKIP $idx $name" >> "$STATUS"; return; fi
  echo "[queue] $(date +%H:%M:%S) START $idx $name" | tee -a "$STATUS"
  timeout "$to" "$@" > "test_results/$log" 2>&1
  local rc=$?
  echo "[queue] $(date +%H:%M:%S) DONE $idx $name rc=$rc" | tee -a "$STATUS"
  sleep 90
}

export PYTHONPATH="${PYTHONPATH:-}:/root/repo"

# 1. SOP-61k rerank sweep refresh under current defaults (item 5a)
run_job 1 rerank_scaling rerank_scaling_r5.log 3600 \
  python scripts/bench_rerank_scaling.py

# 2. Discriminative quality-parity matrix for every flipped default (item 3).
#    Operating point calibrated on the chip (see parity_quality.py docstring):
#    sep 0.9 + nuisance 0.5 + 12 epochs lr 1e-3 lands resnet f32 mid-range
#    (trajectory 21 -> 55) instead of saturating at 100 or pinning at chance.
run_job 2 parity_quality parity_quality_r5.log 14400 \
  python scripts/parity_quality.py

# 3. MSLS production-scale cached subcache cycle (item 7)
run_job 3 stress_msls_train stress_msls_train_r5.log 5400 \
  python scripts/stress_msls_train.py

# 4. SOP-geometry eval through the REAL CLI path with --cache_device:
#    f32 synthetic pool ~12 GB > half-HBM forces the auto-chunk (item 5b)
run_job 4 sop_cli_eval sop_cli_r5.log 5400 \
  python -m vit_reranking_tpu.cli.test_diml \
    --dataset synthetic --synthetic_classes 2500 --synthetic_per_class 8 \
    --synthetic_size 224 --arch cvt_13_normalize --bs 112 \
    --use_rollout --use_uniform --approx_topk --rerank_bf16 \
    --cache_device --embed_dim 128 --grid_size 7 --not_pretrained

# 5. Compiled-Mosaic kernel assertions (item 8 log, r5 edition)
run_job 5 mosaic_tests tpu_mosaic_tests_r5.log 3600 \
  env RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernel.py -s -q

# 6. Promoted at-scale stress suite (item 8: SOP cache + MSLS val)
run_job 6 tpu_stress tpu_stress_r5.log 10800 \
  env RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_stress.py -s -q

echo "QUEUE_R5_ALL_DONE" >> "$STATUS"
