#!/bin/bash
# End-to-end (nm-PM-cont) hyperparameter grid: margin, loss weights,
# dropout, classifier shapes, epochs.
set -e

K=5
for P in "UCA-MoE" "SE-MoE"; do
  for E in 200; do
    for MARGIN in 1; do
      for WCON in 0.1 1; do
        for LAYERS in "128 64 32" "64 32"; do
          ./multimodal_kfold_cvae_nmpmcont.py -P "$P" -E "$E" -K $K \
            -Margin "$MARGIN" -Weightcontrastive "$WCON" -Layers $LAYERS
        done
      done
    done
  done
done
