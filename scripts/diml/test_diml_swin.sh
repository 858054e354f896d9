#!/bin/bash
# Swin-T + DIML rerank on SOP (reference scripts/diml/test_diml_swin.sh:342-344)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_diml_swin \
  --dataset online_products --source_path $datapath --seed 0 --bs 16 \
  --arch swin_normalize --embed_dim 128 --resume_path ${CKPT:?} \
  --use_cls_token --use_ot --grid_size 7
