#!/usr/bin/env python3
"""Drop-in entry point matching the reference classifier_baseline/classifier.py;
see multi_modal_normative_modeling_tpu/cli/classifier_baseline.py."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multi_modal_normative_modeling_tpu.cli.classifier_baseline import run

if __name__ == "__main__":
    run()
