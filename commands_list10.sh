#!/bin/bash
# Legacy driver: the reference's commands_list10.sh invoked bootstrap_*.py
# scripts that were never committed to the repo (SURVEY.md Q9). Kept as a
# placeholder; the live bootstrap-style analysis is covered by
# multimodal_kfold_cvae_group_analysis_1x1.py over k folds.
echo "commands_list10.sh: legacy driver — the bootstrap_*.py scripts it" \
     "invoked are not part of the reference repo (see SURVEY.md Q9)."
