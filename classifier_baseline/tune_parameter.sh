#!/bin/bash
# MLP-classifier baseline grid: epochs, learning rates, hidden shapes, dropout.
set -e
cd "$(dirname "$0")"

for E in 500 1000; do
  for LR in 0.0005 0.0001; do
    for MINLR in 0.000001; do
      for DROP in 0.1 0.3; do
        for H in "116 64 32" "256 128 64"; do
          python classifier.py --num_epochs "$E" --initial_lr "$LR" \
            --min_lr "$MINLR" --dropout "$DROP" --hidden_layers $H \
            --checkpoint_path "checkpoints/model_${E}_${LR}_${MINLR}_${DROP}.pth"
        done
      done
    done
  done
done
