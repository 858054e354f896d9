#!/bin/bash
# Patch-NetVLAD + DIML rerank on MSLS
# (reference scripts/diml/test_diml_vlad.sh:358 -> test_msls_vlad_diml.py with
#  netvlad_pca128, 16 clusters, WPCA128 checkpoint)
dataset=${1:-msls}
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.test_msls_vlad_diml \
  --dataset $dataset --source_path $datapath \
  --seed 0 --bs 8 --data_sampler class_random --samples_per_class 2 \
  --arch netvlad_pca128 --group diml_test_res50 \
  --embed_dim 128 --evaluate_on_gpu \
  --pooling netvlad --num_clusters 16 \
  ${VLAD_CKPT:+--vlad_ckpt $VLAD_CKPT} \
  --append_pca_layer --num_pcs 128 --use_ot
