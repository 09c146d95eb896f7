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
                    name: str = "cVAE_model",
                    backend: str = "msgpack") -> Path:
    """backend 'msgpack' (single-file flax.serialization blob, default) or
    'orbax' (ocp.StandardCheckpointer directory)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        target = (directory / f"{name}.orbax").resolve()
        if target.exists():
            import shutil

            shutil.rmtree(target)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(target, params)
        checkpointer.wait_until_finished()
        out = target
    else:
        blob = serialization.to_bytes(params)
        (directory / f"{name}.ckpt").write_bytes(blob)
        out = directory / f"{name}.ckpt"
    with open(directory / f"{name}.json", "w") as f:
        json.dump(model_config, f, indent=1)
    return out


def load_checkpoint(directory, template_params=None,
                    name: str = "cVAE_model") -> Tuple[dict, dict]:
    """Returns (params, model_config). ``template_params`` (a pytree with the
    right structure) restores exact types; if omitted, the stored raw
    structure is returned. Detects the backend from what's on disk."""
    directory = Path(directory)
    with open(directory / f"{name}.json") as f:
        config = json.load(f)
    orbax_dir = directory / f"{name}.orbax"
    if orbax_dir.exists():
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        if template_params is not None:
            import jax.numpy as jnp

            abstract = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
                template_params)
            params = checkpointer.restore(orbax_dir.resolve(), abstract)
        else:
            params = checkpointer.restore(orbax_dir.resolve())
        return params, config
    blob = (directory / f"{name}.ckpt").read_bytes()
    if template_params is not None:
        params = serialization.from_bytes(template_params, blob)
    else:
        params = serialization.msgpack_restore(blob)
    return params, config


def checkpoint_exists(directory, name: str = "cVAE_model") -> bool:
    directory = Path(directory)
    return ((directory / f"{name}.ckpt").exists()
            or (directory / f"{name}.orbax").exists())
