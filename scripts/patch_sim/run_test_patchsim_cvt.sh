#!/bin/bash
# CvT patch-similarity degeneration study
# (reference scripts/patch_sim/run_test_patchsim_cvt.sh)
dataset=${1:-cub200}
embed_dim=${2:-128}
arch=${3:-cvt_13_normalize}
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_pair_patchsim \
  --dataset $dataset --source_path $datapath \
  --seed 0 --bs 16 --data_sampler class_random --samples_per_class 2 \
  --arch $arch --group patchsim_cvt \
  --embed_dim $embed_dim --evaluate_on_gpu \
  ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
