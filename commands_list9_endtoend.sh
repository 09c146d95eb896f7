#!/bin/bash
# End-to-end (nm-PM-cont) grid over contrastive weight x classifier shapes
# (margin/epochs pinned; extend the loops for the reference's full
# 26k-point grid, or use cli/sweep_endtoend.py to run a whole grid as ONE
# vmapped device program).
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

# TPU-native alternative: the whole grid as ONE device program (every
# (margin, weight) config x every fold trains concurrently):
#   python -m multi_modal_normative_modeling_tpu.cli.sweep_endtoend \
#     -P SE-MoE -E 200 -K 5 -Margins 0.25 0.5 1 2 -Weightcontrastives 0.1 0.5 1
