#!/bin/bash
# Flagship sweep: train -> test -> group analysis for the proposed model
# (UCA-gPoE early-fusion multimodal cVAE, disease-modeling direction).
set -e

E_VALUES=(50)
P_VALUES=("UCA-gPoE")
MODEL_VALUES=("cVAE_multimodal")
K_VALUES=(10)

for e in "${E_VALUES[@]}"; do
  for p in "${P_VALUES[@]}"; do
    for m in "${MODEL_VALUES[@]}"; do
      for k in "${K_VALUES[@]}"; do
        ./multimodal_kfold_train_cvae_supervised.py -P "$p" -E "$e" -Model "$m" -K "$k" -TrainingClass 'dm'
        ./multimodal_kfold_test_cvae_supervised.py -P "$p" -K "$k"
        ./multimodal_kfold_cvae_group_analysis_1x1.py -P "$p" -E "$e" -Model "$m" -K "$k" -TrainingClass 'dm'
      done
    done
  done
done

# Fusion-baseline sweeps (uncomment to run; each block is complete):
# for p in SE-MoE SE-PoE SE-gPoE; do
#   ./multimodal_kfold_train_cvae_supervised.py -P "$p" -E 50 -Model cVAE_multimodal -K 10 -TrainingClass dm
#   ./multimodal_kfold_test_cvae_supervised.py  -P "$p" -K 10
#   ./multimodal_kfold_cvae_group_analysis_1x1.py -P "$p" -E 50 -K 10 -TrainingClass dm
# done
# for m in mmJSD DMVAE WeightedDMVAE mvtCAE mmVAEPlus; do
#   ./multimodal_kfold_train_cvae_supervised.py -P SE-PoE -E 50 -Model "$m" -K 10 -TrainingClass dm
#   ./multimodal_kfold_test_cvae_supervised.py  -P SE-PoE -K 10
#   ./multimodal_kfold_cvae_group_analysis_1x1.py -P SE-PoE -E 50 -K 10 -TrainingClass dm
# done
