#!/bin/bash
# Round-5 queue, part B (after the parity matrix): seed-1 replication of the
# flagged resnet bf16 delta, then items 7 / 5b / 8.  Same serialization
# discipline as run_queue_r5.sh.
set -u
cd /root/repo
STATUS=test_results/queue_r5.status

run_job() {  # run_job <name> <log> <timeout_s> <cmd...>
  local name=$1 log=$2 to=$3; shift 3
  echo "[queueB] $(date +%H:%M:%S) START $name" | tee -a "$STATUS"
  timeout "$to" "$@" > "test_results/$log" 2>&1
  local rc=$?
  echo "[queueB] $(date +%H:%M:%S) DONE $name rc=$rc" | tee -a "$STATUS"
  sleep 90
}

export PYTHONPATH="${PYTHONPATH:-}:/root/repo"

# B1. Does the resnet bf16 -8.3 R@1 delta replicate on a fresh seed?
run_job parity_resnet_s1 parity_resnet_s1_r5.log 7200 \
  python scripts/parity_quality.py --arches resnet --seeds 1

# B2. MSLS production-scale cached subcache cycle (item 7)
run_job stress_msls_train stress_msls_train_r5.log 5400 \
  python scripts/stress_msls_train.py

# B3. SOP-geometry eval through the REAL CLI with --cache_device (item 5b)
run_job sop_cli_eval sop_cli_r5.log 5400 \
  python -m vit_reranking_tpu.cli.test_diml \
    --dataset synthetic --synthetic_classes 2500 --synthetic_per_class 8 \
    --synthetic_size 224 --arch cvt_13_normalize --bs 112 \
    --use_rollout --use_uniform --approx_topk --rerank_bf16 \
    --cache_device --embed_dim 128 --grid_size 7 --not_pretrained

# B4. Compiled-Mosaic kernel assertions, r5 log (item 8)
run_job mosaic_tests tpu_mosaic_tests_r5.log 3600 \
  env RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernel.py -s -q

# B5. Promoted at-scale stress suite (item 8) — MSLS val first (cheaper),
#     SOP cache last (pays the ~20 min bs=112 compile)
run_job tpu_stress_msls tpu_stress_r5.log 7200 \
  env RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_stress.py -s -q \
    -k "msls"
run_job tpu_stress_sop tpu_stress_sop_r5.log 7200 \
  env RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_stress.py -s -q \
    -k "sop"

echo "QUEUE_R5B_ALL_DONE" >> "$STATUS"
