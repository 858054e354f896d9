#!/bin/bash
# Canonical DIML structural-loss training recipe
# (reference scripts/diml/train_diml.sh: resnet50_diml_frozen_normalize,
#  margin_diml + distance mining, bs 112 SPC-2, lr 1e-5, evalevery 10)
dataset=${1:-cars196}
bs=${2:-112}
loss=${3:-margin_diml}
epochs=${4:-100}
seed=${5:-0}
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.train_diml \
  --dataset $dataset --source_path $datapath --loss $loss --batch_mining distance \
  --group ${dataset}_${loss} --seed $seed \
  --bs $bs --data_sampler class_random --samples_per_class 2 \
  --arch resnet50_diml_frozen_normalize --n_epochs $epochs \
  --lr 0.00001 --embed_dim 128 --evaluate_on_gpu --evalevery 10 \
  ${RESNET_CKPT:+--pretrained_ckpt $RESNET_CKPT}
