#!/bin/bash
# MSLS CvT finetune: embed-KD distillation from Patch-NetVLAD + triplet
# (reference scripts/baselines/msls_finetune.sh active stanza:
#  train_msls_KDembed_tri.py, kd_weight 10, lr 1e-4, bs 6, 30 epochs)
dataset=${1:-msls}
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.train_msls_KDembed_tri \
  --dataset $dataset --kernels 8 --source_path $datapath --n_epochs 30 \
  --group MSLS_CVT_triplet+KD10_1e-4 --loss_margin_beta 0.6 --seed 0 --bs 6 \
  --pooling patchnetvlad \
  --samples_per_class 2 --loss margin --batch_mining distance \
  --arch cvt_13_normalize --embed_dim 128 --num_clusters 16 \
  ${VLAD_CKPT:+--vlad_ckpt $VLAD_CKPT} \
  --append_pca_layer --num_pcs 128 \
  --imageresizew 224 --imageresizeh 224 --optim adam --lr 0.0001 \
  --cachebatchsize 20 --evalevery 1 \
  --distill embed --kd_weight 10.0 \
  ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
