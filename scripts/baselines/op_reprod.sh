#!/bin/bash
# Stanford Online Products training (reference scripts/baselines/op_reprod.sh)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.train_baseline \
  --dataset online_products --source_path $datapath --kernels 6 --n_epochs 100 \
  --group OP_Margin_b12_Distance_cvt --seed 0 --bs 112 --samples_per_class 2 \
  --loss margin --batch_mining distance --arch cvt_13_normalize --embed_dim 128 \
  --evalevery 10 --max_patience 5 ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
