#!/bin/bash
# Patch-similarity degeneration study (reference scripts/patch_sim/run_test_patchsim_*.sh)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_pair_patchsim \
  --dataset cub200 --source_path $datapath --arch vit_normalize --bs 16 \
  ${VIT_CKPT:+--pretrained_ckpt $VIT_CKPT}
