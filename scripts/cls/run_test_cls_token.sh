#!/bin/bash
# Cls-token cluster analysis (reference scripts/cls/run_test_cls_token.sh)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_cls_token \
  --dataset cub200 --source_path $datapath --arch vit_normalize --embed_dim 128 \
  --bs 16 ${VIT_CKPT:+--pretrained_ckpt $VIT_CKPT}
