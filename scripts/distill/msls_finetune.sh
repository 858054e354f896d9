#!/bin/bash
# MSLS CvT distillation finetune, 512-d embed vs WPCA512 teacher, KD-only
# (reference scripts/distill/msls_finetune.sh active stanza:
#  train_msls_KDembed_tri.py, embed_dim 512, kd_weight 1.0, tl_weight 0.0,
#  task_loss triplet, 10 epochs, --mini_data)
dataset=${1:-msls}
datapath=${MSLS_ROOT:?set MSLS_ROOT}
python -m vit_reranking_tpu.cli.train_msls_KDembed_tri \
  --dataset $dataset --kernels 8 --source_path $datapath --n_epochs 10 \
  --group mini_MSLS_CVT512_vlad512_embed1_1e-4 --loss_margin_beta 0.6 --seed 0 --bs 6 \
  --pooling patchnetvlad \
  --samples_per_class 2 --loss margin --batch_mining distance \
  --arch cvt_13_normalize --embed_dim 512 --num_clusters 16 \
  ${VLAD_CKPT:+--vlad_ckpt $VLAD_CKPT} \
  --append_pca_layer --num_pcs 512 \
  --imageresizew 224 --imageresizeh 224 --optim adam --lr 0.0001 \
  --cachebatchsize 20 --evalevery 1 --task_loss triplet \
  --distill embed --kd_weight 1.0 --tl_weight 0.0 --mini_data \
  ${CVT_CKPT:+--pretrained_ckpt $CVT_CKPT}
