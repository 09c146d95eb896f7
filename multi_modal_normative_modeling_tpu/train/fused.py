"""Whole-fold trainer on the fully-fused Pallas train-step kernel.

Same contract as train/trainer.py's FoldTrainer (reference hot loop
multimodal_kfold_train_cvae_supervised.py:177-199) but every optimizer step's
forward+backward runs inside ONE pallas_call (kernels/train_step.py) on the
packed-modality layout (models/stacked.py). optax adam + the valid-batch skip
are identical to the XLA trainer, and the reparameterization PRNG stream is
the same (jax.random.normal(sub, [B, Z])), so trajectories are comparable
step-for-step.

Scope: variant 'cvae' (cVAE_multimodal), fusion in {poe,gpoe,moe,mopoe},
fp32, any hidden depth. `supported()` pre-checks this plus the VMEM
feasibility estimate; the CLI falls back to the XLA path otherwise (and on
any Mosaic compile failure).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kernels.train_step import FusedTrainStep
from ..models.stacked import StackedMultimodalCVAE
from .trainer import TrainConfig, build_optimizer


def supported(model, config: TrainConfig, batch_size: int,
              fold_parallel: bool = False) -> Tuple[bool, str]:
    """(ok, reason). ``model`` is the MultimodalCVAE the CLI built."""
    variant = getattr(model, "variant", None)
    if variant != "cvae":
        return False, f"model variant {variant!r} (fused supports 'cvae')"
    if config.combine.lower() not in ("poe", "gpoe", "moe", "mopoe"):
        return False, f"fusion {config.combine!r}"
    if config.precision != "fp32":
        return False, f"precision {config.precision!r} (fused kernel is fp32)"
    if fold_parallel:
        return False, "--fold_parallel (fused path trains folds sequentially)"
    stacked = StackedMultimodalCVAE(
        model.input_dim_list, model.hidden_dim, model.latent_dim,
        model.c_dim, model.modalities, model.non_linear)
    step = FusedTrainStep(stacked, config.combine, interpret=None)
    if not step.fits_vmem(batch_size):
        mb = step.vmem_bytes(batch_size) / 2**20
        return False, (f"shapes need ~{mb:.0f} MiB VMEM "
                       "(exceeds this core's budget)")
    return True, ""


def make_packed_batches(stacked: StackedMultimodalCVAE,
                        data_list: Sequence[np.ndarray],
                        cov: np.ndarray, batch_size: int) -> dict:
    """Per-modality sample arrays -> padded packed batch tensors:
    x [NB, M, B, d_max], c [NB, B, c_dim], mask [NB, B], valid [NB]."""
    n = data_list[0].shape[0]
    nb = max(1, -(-n // batch_size))
    padded = nb * batch_size
    x = np.zeros((stacked.modalities, padded, stacked.d_max), dtype=np.float32)
    for m, d in enumerate(data_list):
        x[m, :n, : d.shape[1]] = d
    c = np.zeros((padded, cov.shape[1]), dtype=np.float32)
    c[:n] = cov
    mask = np.zeros((padded,), dtype=np.float32)
    mask[:n] = 1.0
    return {
        "x": np.swapaxes(x.reshape(stacked.modalities, nb, batch_size,
                                   stacked.d_max), 0, 1).copy(),
        "c": c.reshape(nb, batch_size, -1),
        "mask": mask.reshape(nb, batch_size),
        "valid": (mask.reshape(nb, batch_size).sum(axis=1) > 0),
    }


class FusedFoldTrainer:
    """Jitted whole-fold trainer over the fused kernel; reusable across folds
    with identical padded shapes."""

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 interpret: Optional[bool] = None):
        self.stacked = StackedMultimodalCVAE(
            model.input_dim_list, model.hidden_dim, model.latent_dim,
            model.c_dim, model.modalities, model.non_linear)
        self.config = config
        self.step = FusedTrainStep(self.stacked, config.combine,
                                   interpret=interpret)
        self.optimizer = build_optimizer(config, n_samples)
        self._train = jax.jit(self._build_train())

    def _build_train(self):
        optimizer = self.optimizer
        fused = self.step
        latent_dim = self.stacked.latent_dim
        epochs = self.config.epochs

        def one_step(carry, batch):
            params, opt_state, key = carry
            new_key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, (batch["x"].shape[1], latent_dim),
                                    jnp.float32)
            losses, grads = fused.loss_and_grads(
                params, batch["x"], batch["c"], eps, batch["mask"])
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            valid = batch["valid"]
            where = lambda a, b: jax.tree_util.tree_map(
                lambda u, v: jnp.where(valid, u, v), a, b)
            return (where(new_params, params), where(new_opt_state, opt_state),
                    where(new_key, key)), losses

        def train(packed_params, batches, key):
            def epoch(carry, _):
                params, opt_state, key = carry
                # mirror the XLA trainer's per-epoch shuffle-key split (even
                # with shuffle off) so the PRNG streams stay identical
                key, _ = jax.random.split(key)
                carry, aux = jax.lax.scan(one_step,
                                          (params, opt_state, key), batches)
                first = jax.tree_util.tree_map(lambda a: a[0], aux)
                return carry, first

            opt_state = optimizer.init(packed_params)
            (params, _, _), logs = jax.lax.scan(
                epoch, (packed_params, opt_state, key), None, length=epochs)
            return params, logs

        return train

    def run(self, per_modality_params, data_list, cov, key=None):
        """Takes/returns the standard per-modality pytree (checkpoints and
        the inference path are unchanged)."""
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        packed = self.stacked.pack_params(per_modality_params)
        batches = make_packed_batches(self.stacked, data_list, cov,
                                      self.config.batch_size)
        out, logs = self._train(packed, jax.device_put(batches), key)
        host = jax.tree_util.tree_map(np.asarray, jax.device_get(out))
        return (self.stacked.unpack_params(host),
                jax.tree_util.tree_map(np.asarray, jax.device_get(logs)))
