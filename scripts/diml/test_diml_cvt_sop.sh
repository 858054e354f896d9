#!/bin/bash
# Large-gallery stress: SOP + CvT rerank (reference scripts/diml/test_diml_cvt_sop.sh:331-336)
datapath=${DATAPATH:-data}
python -m vit_reranking_tpu.cli.test_diml_cvt \
  --dataset online_products --source_path $datapath --seed 0 --bs 16 \
  --arch cvt_13_normalize --embed_dim 128 --resume_path ${CKPT:?} \
  --use_cls_token --temperature 0.1 --use_ot --use_minus --grid_size 7 \
  --ot_part 0.9 --use_rollout
