#!/bin/bash
# DeiT-small attention-marginal rerank (reference scripts/diml/test_diml_vit.sh, eval_attn_diml path)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_diml_vit \
  --dataset cub200 --source_path $datapath --seed 0 --bs 16 \
  --arch vit_normalize --embed_dim 128 --resume_path ${CKPT:?} \
  --use_qk --blk_ind 0 --use_ot --grid_size 14
