#!/usr/bin/env python3
"""Drop-in entry point matching the reference script of the same name; see
multi_modal_normative_modeling_tpu/cli/nmmlp.py."""
from multi_modal_normative_modeling_tpu.cli.nmmlp import run

if __name__ == "__main__":
    run()
