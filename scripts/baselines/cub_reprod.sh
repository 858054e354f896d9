#!/bin/bash
# Step-1 global-embedding DML training on CUB200 (reference scripts/baselines/cub_reprod.sh)
# Canonical recipe: margin loss beta=1.2 + distance mining, CvT-13, bs 112, SPC-2
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.train_baseline \
  --dataset cub200 --source_path $datapath --kernels 6 --n_epochs 150 \
  --group CUB_Margin_b12_Distance_cvt --seed 0 --bs 112 --samples_per_class 2 \
  --loss margin --batch_mining distance --arch cvt_13_normalize --embed_dim 128 \
  --evalevery 10 --max_patience 5 ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
