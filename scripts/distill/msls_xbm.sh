#!/bin/bash
# CvT student distillation with XBM (reference scripts/distill/msls_xbm.sh:499-506)
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.train_msls_distill \
  --dataset msls --source_path $datapath --arch cvt_13_normalize --embed_dim 4096 \
  --distill embed --kd_weight 1.0 --tl_weight 1.0 --task_loss triplet \
  --enable_xbm --xbm_size 10000 --xbm_start_iteration 1000 --xbm_weight 1.0 \
  --nNeg 5 --margin 0.1 --lr 0.0001 ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT} \
  ${VLAD_CKPT:+--vlad_ckpt $VLAD_CKPT}
