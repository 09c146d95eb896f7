#!/bin/bash
# ADHD sweep: single-modality and separate-encoder fusion variants over
# epochs, learning-rate grid and architecture shapes, plus baseline models.
#
# TPU-first equivalent of the main grid below (120 points) as 20 fold-parallel
# training runs — the epochs axis is snapshotted from one run to max(E) and
# the lr axis deduped (the reference's LR assignment is a no-op, SURVEY.md Q1):
#
#   python -m multi_modal_normative_modeling_tpu.cli.sweep_supervised \
#     -R ADHD -K 10 \
#     --procedures SM-sMRI SM-fMRI SE-MoE SE-PoE SE-gPoE \
#     --epochs_list 50 500 1000 \
#     --lr_grid '1e-4:5e-3,1e-5:5e-3' \
#     --hz_grid '110 110 10;230 230 20;110 110 110 10;460 460 40'
set -e

K=10
R=ADHD

for P in "SM-sMRI" "SM-fMRI" "SE-MoE" "SE-PoE" "SE-gPoE"; do
  for E in 50 500 1000; do
    for BLR in 0.0001 0.00001; do
      for H in "110 110 10" "230 230 20" "110 110 110 10" "460 460 40"; do
        ./multimodal_kfold_train_cvae_supervised.py -R $R -P "$P" -E "$E" -K $K \
          -Baselearningrate "$BLR" -H $H
        ./multimodal_kfold_test_cvae_supervised.py -R $R -P "$P" -K $K -H $H
        ./multimodal_kfold_cvae_group_analysis_1x1.py -R $R -P "$P" -E "$E" -K $K -H $H
      done
    done
  done
done

for M in mmJSD DMVAE WeightedDMVAE mvtCAE mmVAEPlus; do
  ./multimodal_kfold_train_cvae_supervised.py -R $R -P SE-PoE -E 500 -K $K -Model "$M"
  ./multimodal_kfold_test_cvae_supervised.py -R $R -P SE-PoE -K $K
  ./multimodal_kfold_cvae_group_analysis_1x1.py -R $R -P SE-PoE -E 500 -K $K -Model "$M"
done
