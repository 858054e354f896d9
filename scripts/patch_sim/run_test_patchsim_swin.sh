#!/bin/bash
# Swin-T patch-similarity degeneration study
# (reference scripts/patch_sim/run_test_patchsim_swin.sh)
dataset=${1:-cub200}
embed_dim=${2:-128}
arch=${3:-swin_tiny_normalize}
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_pair_patchsim \
  --dataset $dataset --source_path $datapath \
  --seed 0 --bs 16 --data_sampler class_random --samples_per_class 2 \
  --arch $arch --group patchsim_swin \
  --embed_dim $embed_dim --evaluate_on_gpu \
  ${SWIN_CKPT:+--pretrained_ckpt $SWIN_CKPT}
