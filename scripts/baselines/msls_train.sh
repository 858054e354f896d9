#!/bin/bash
# MSLS CvT triplet baseline (reference scripts/baselines/msls_train.sh)
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.train_msls_baseline \
  --dataset msls --source_path $datapath --arch cvt_13_normalize --embed_dim 128 \
  --nNeg 5 --margin 0.1 --lr 0.0001 --optim adam --lrstep 20 --lrgamma 0.5 \
  --n_epochs 30 --evalevery 1 --cachebatchsize 20 ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
