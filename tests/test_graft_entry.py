"""Driver contract: __graft_entry__.entry compiles single-device and
dryrun_multichip executes on the 8-virtual-device CPU mesh."""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd_count():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    # non-square factorizations must work too (e.g. 6 = 2x3)
    graft.dryrun_multichip(6)
