#!/bin/bash
# CUB200 ResNet-50 128-d eval, no rerank (reference scripts/diml/test_diml.sh:244-249)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_diml_base \
  --dataset cub200 --source_path $datapath --seed 0 --bs 16 \
  --arch resnet50_frozen_normalize --embed_dim 128 --resume_path ${CKPT:?} \
  --grid_size 4 --use_uniform
