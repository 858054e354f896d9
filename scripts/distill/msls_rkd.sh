#!/bin/bash
# Relational KD distillation (reference scripts/distill/msls_rkd.sh)
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.train_msls_distill \
  --dataset msls --source_path $datapath --arch cvt_13_normalize --embed_dim 4096 \
  --distill rkd --rkd_distance_weight 1.0 --rkd_angle_weight 1.0 --kd_weight 1.0 \
  --nNeg 5 --margin 0.1 --lr 0.0001 ${VLAD_CKPT:+--vlad_ckpt $VLAD_CKPT}
