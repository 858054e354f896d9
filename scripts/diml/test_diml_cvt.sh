#!/bin/bash
# THE flagship rerank eval (reference readme.md:10-11, scripts/diml/test_diml_cvt.sh:262-264):
# CvT-13 + attention-rollout OT rerank, grid 7, full OT
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_diml_cvt \
  --dataset cub200 --source_path $datapath --seed 0 --bs 16 \
  --arch cvt_13_normalize --embed_dim 128 --resume_path ${CKPT:?set CKPT to a trained checkpoint} \
  --use_cls_token --temperature 0.1 --use_ot --use_inverse --grid_size 7 \
  --ot_part 1.0 --use_rollout
