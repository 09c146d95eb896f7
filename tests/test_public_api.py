"""Top-level lazy public API (package __init__ PEP 562 facade).

The package promises two things: (a) every advertised name resolves to the
real implementation, and (b) `import multi_modal_normative_modeling_tpu`
itself stays featherweight — no jax/numpy import until an attribute is
touched (backend selection must stay with the caller; see utils/jaxconfig.py
and CLAUDE.md's JAX_PLATFORMS notes).
"""
import subprocess
import sys

import pytest

import multi_modal_normative_modeling_tpu as mmnm


def test_every_public_name_resolves():
    for name in mmnm.__all__:
        obj = getattr(mmnm, name)
        assert obj is not None, name


def test_facade_points_at_real_implementations():
    from multi_modal_normative_modeling_tpu.infer.deviation import (
        reconstruction_deviation,
    )
    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.registry import get_hc_label

    assert mmnm.build_model is build_model
    assert mmnm.reconstruction_deviation is reconstruction_deviation
    assert mmnm.get_hc_label is get_hc_label
    assert mmnm.get_hc_label("ADNI") == 2


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError, match="no attribute 'nope'"):
        mmnm.nope


def test_dir_lists_public_api():
    listing = dir(mmnm)
    for name in ("build_model", "MultiFoldTrainer", "load_ensemble",
                 "registry", "models"):
        assert name in listing


def test_bare_import_stays_light():
    # subprocess: this test module itself imports the package (and conftest
    # imports jax), so the lightness claim needs a fresh interpreter
    # diff-based: this image's sitecustomize preloads jax/numpy in EVERY
    # interpreter, so assert the package import adds no heavy module itself
    code = (
        "import sys\n"
        "before = set(sys.modules)\n"
        "import multi_modal_normative_modeling_tpu\n"
        "new = set(sys.modules) - before\n"
        "heavy = [m for m in ('jax', 'numpy', 'pandas', 'torch',\n"
        "                     'matplotlib', 'scipy')\n"
        "         if m in new]\n"
        "assert not heavy, f'bare import pulled {heavy}'\n"
        "print('light')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "light" in out.stdout


def test_facade_e2e_smoke():
    """Train-ish smoke through facade names only: build a model, init params,
    run the deviation math."""
    import numpy as np

    model = mmnm.build_model("cVAE_multimodal", [6, 8], [8, 8], 4, 3, 2)
    from multi_modal_normative_modeling_tpu.cli.common import (
        host_init_params,
    )

    params = host_init_params(model, seed=0)
    assert params is not None
    x = np.random.default_rng(0).normal(size=(5, 6)).astype(np.float32)
    xhat = x + 0.1
    dev = mmnm.reconstruction_deviation(x, xhat)
    assert dev.shape == (5,)
    assert np.allclose(dev, 0.01, atol=1e-5)
