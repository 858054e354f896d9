#!/bin/bash
# DIML structural-loss training (reference scripts/diml/train_cvt.sh:383-389)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.train_diml \
  --dataset cub200 --source_path $datapath --loss margin_diml --batch_mining distance \
  --group CUB_MarginDIML_cvt --seed 0 --bs 112 --samples_per_class 2 \
  --arch cvt_diml_normalize_frozen --embed_dim 128 --grid_size 7 \
  --use_cls_token --evalevery 10 ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
