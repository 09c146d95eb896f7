"""Whole-fold trainers on the packed split-latent (DMVAE-family) layout.

Same contracts as train/grouped.py's trainers, with the layout swapped for
models/grouped_dmvae.GroupedDMVAE: the DMVAE/WeightedDMVAE/mmVAEPlus
skeleton (covariate-free encoders, private/shared latent split, sigmoid
decoders) packs onto one [M, B, H] batched-einsum modality axis with
width-dependent ops per width group at exact width. PRNG streams match the
per-modality FoldTrainer exactly (one [B, Z-s] reparameterization draw per
step), so trajectories agree to float-reorder tolerance
(tests/test_packed_dmvae.py).
"""
from __future__ import annotations

from ..models.grouped_dmvae import GroupedDMVAE
from .grouped import make_grouped_fold_batches
from .packed import PackedFoldTrainer, PackedMultiFoldTrainer
from .trainer import TrainConfig


def _dmvae_loss_fn(grouped: GroupedDMVAE, combine: str,
                   precision: str = "fp32"):
    # combine/precision ride the shared _loss_builder hook signature; the
    # DMVAE family always fuses by PoE (combine is ignored, like the
    # per-modality model) and packs fp32-only (packed_supported gates bf16)
    def loss_fn(p, batch, k):
        fwd = grouped.forward(p, batch["x"], k)
        losses = grouped.loss(p, batch["x"], fwd, batch["mask"])
        return losses["total"], losses

    return loss_fn


def _build_grouped_dmvae(model):
    variant = getattr(model, "variant", None)
    if variant not in ("dmvae", "weighted", "mmvaeplus"):
        raise ValueError(
            f"split-latent grouped layout supports the DMVAE family "
            f"(dmvae/weighted/mmvaeplus), got {variant!r}")
    return GroupedDMVAE(model.input_dim_list, model.hidden_dim,
                        model.latent_dim, model.c_dim, model.modalities,
                        variant=variant)


class GroupedDMVAEFoldTrainer(PackedFoldTrainer):
    """Sequential whole-fold trainer on the split-latent packed layout."""

    _batch_maker = staticmethod(make_grouped_fold_batches)
    _loss_builder = staticmethod(_dmvae_loss_fn)

    def _build_stacked(self, model):
        return _build_grouped_dmvae(model)

    def _loss_name(self) -> str:
        return f"packed_grouped_{self.stacked.variant}"


class GroupedDMVAEMultiFoldTrainer(PackedMultiFoldTrainer):
    """vmap(split-latent packed whole-fold trainer) over a stacked fold
    axis. No mesh form (the DMVAE family's EP story stays per-modality)."""

    _batch_maker = staticmethod(make_grouped_fold_batches)
    _loss_builder = staticmethod(_dmvae_loss_fn)

    def _build_stacked(self, model):
        return _build_grouped_dmvae(model)

    def _loss_name(self) -> str:
        return f"packed_grouped_{self.stacked.variant}"

    def __init__(self, model, config: TrainConfig, n_samples: int):
        super().__init__(model, config, n_samples)
