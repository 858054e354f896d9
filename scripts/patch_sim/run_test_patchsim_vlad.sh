#!/bin/bash
# Pretrained-NetVLAD patch-similarity degeneration study
# (reference scripts/patch_sim/run_test_patchsim_vlad.sh ->
#  test_pair_patchsim_vlad.py with arch pretrained_netvlad)
dataset=${1:-msls}
embed_dim=${2:-128}
arch=${3:-pretrained_netvlad}
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.test_pair_patchsim_vlad \
  --dataset $dataset --source_path $datapath \
  --seed 0 --bs 16 --data_sampler class_random --samples_per_class 2 \
  --arch $arch --group patchsim_vlad \
  --embed_dim $embed_dim --evaluate_on_gpu \
  ${VLAD_CKPT:+--vlad_ckpt $VLAD_CKPT}
