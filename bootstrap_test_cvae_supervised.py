#!/usr/bin/env python3
"""Drop-in entry point for the reference commands_list10.sh's `bootstrap_test_cvae_supervised.py`
(a script the reference repo never committed — SURVEY.md Q9); see
multi_modal_normative_modeling_tpu/cli/bootstrap.py."""
import sys

from multi_modal_normative_modeling_tpu.cli import bootstrap

if __name__ == "__main__":
    args = bootstrap.build_parser().parse_args(["test"] + sys.argv[1:])
    bootstrap.main(args)
