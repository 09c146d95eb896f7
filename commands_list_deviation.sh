#!/bin/bash
# Deviation-map generation at E=800 for ADNI and ADHD (disease modeling).
set -e

K=10
for R in ADNI; do
  for P in "UCA-gPoE" "SM-av45" "SM-fdg" "SM-vbm"; do
    ./multimodal_kfold_train_cvae_supervised.py -P "$P" -E 800 -K "$K" -R "$R" -TrainingClass dm
    ./multimodal_kfold_test_cvae_supervised.py -P "$P" -K "$K" -R "$R"
  done
done

for R in ADHD; do
  for P in "UCA-gPoE" "SM-fMRI" "SM-sMRI"; do
    ./multimodal_kfold_train_cvae_supervised.py -P "$P" -E 800 -K "$K" -R "$R" -TrainingClass dm
    ./multimodal_kfold_test_cvae_supervised.py -P "$P" -K "$K" -R "$R"
  done
done
