#!/bin/bash
# MSLS recall eval with PatchNetVLAD WPCA4096 (reference scripts/baselines/msls_test.sh:106)
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.test_msls_baseline \
  --dataset msls --source_path $datapath --arch patchnetvlad --pooling patchnetvlad \
  --num_pcs 4096 --append_pca_layer ${VLAD_CKPT:+--pretrained_ckpt $VLAD_CKPT} --use_ot
