"""Per-fold checkpointing.

The reference pickles whole torch modules per fold
(multimodal_kfold_train_cvae_supervised.py:211-212, ``cVAE_model.pkl``) and
re-loads them in the test scripts. Here checkpoints are msgpack parameter
pytrees plus a JSON model config (enough to rebuild the model), written to the
same per-fold directory layout ``outputs/kfold_analysis/supervised_cvae/<fold>/``
under the name ``cVAE_model.ckpt`` / ``cVAE_model.json``.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(directory, params, model_config: dict,
                    name: str = "cVAE_model") -> Path:
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    blob = serialization.to_bytes(params)
    (directory / f"{name}.ckpt").write_bytes(blob)
    with open(directory / f"{name}.json", "w") as f:
        json.dump(model_config, f, indent=1)
    return directory / f"{name}.ckpt"


def load_checkpoint(directory, template_params=None,
                    name: str = "cVAE_model") -> Tuple[dict, dict]:
    """Returns (params, model_config). ``template_params`` (a pytree with the
    right structure) restores exact types; if omitted, msgpack's raw dict
    structure is returned."""
    directory = Path(directory)
    blob = (directory / f"{name}.ckpt").read_bytes()
    with open(directory / f"{name}.json") as f:
        config = json.load(f)
    if template_params is not None:
        params = serialization.from_bytes(template_params, blob)
    else:
        params = serialization.msgpack_restore(blob)
    return params, config


def checkpoint_exists(directory, name: str = "cVAE_model") -> bool:
    return (Path(directory) / f"{name}.ckpt").exists()
