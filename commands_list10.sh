#!/bin/bash
# The reference's commands_list10.sh invoked bootstrap_*.py scripts that were
# never committed to its repo (reference commands_list10.sh:8-38, SURVEY.md
# Q9). This framework implements that chain for real (cli/bootstrap.py):
# bootstrap-resampled normative modeling on the 3modalities early-fusion
# table, cVAE and unconditioned-VAE variants, each stage one vmapped device
# program over all replicates.
#
# The reference grid is E in 100..1500 step 100; default here is a smaller
# grid — override with e.g. `E_VALUES="100 200 300" ./commands_list10.sh`.
set -e

./bootstrap_create_ids.py -R ADNI

E_VALUES=(${E_VALUES:-100 200})
D_VALUES=(3modalities)

for d in ${D_VALUES[@]}; do
    for e in "${E_VALUES[@]}"; do
        ./bootstrap_train_cvae_supervised.py -R ADNI -D $d -E $e
        ./bootstrap_test_cvae_supervised.py -R ADNI -D $d
        ./bootstrap_cvae_group_analysis_1x1.py -R ADNI -D $d -E $e
    done
done

for d in ${D_VALUES[@]}; do
    for e in "${E_VALUES[@]}"; do
        ./bootstrap_train_vae_supervised.py -R ADNI -D $d -E $e
        ./bootstrap_test_vae_supervised.py -R ADNI -D $d
        ./bootstrap_vae_group_analysis_1x1.py -R ADNI -D $d -E $e
    done
done
