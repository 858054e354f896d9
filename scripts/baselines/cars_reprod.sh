#!/bin/bash
# Cars196 CvT-13 training (reference scripts/baselines/cars_reprod.sh:33):
# margin beta=0.6 + distance mining, bs 112, SPC-2, 150 epochs
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.train_baseline \
  --dataset cars196 --source_path $datapath --kernels 6 --n_epochs 150 \
  --group CARS_Margin_b06_Distance_cvt --loss_margin_beta 0.6 --seed 0 --bs 112 \
  --samples_per_class 2 --loss margin --batch_mining distance \
  --arch cvt_13_normalize --embed_dim 128 --evalevery 10 --max_patience 5 \
  ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
