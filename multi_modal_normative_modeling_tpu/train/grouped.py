"""Whole-fold trainers on the pad-free width-grouped packed layout.

Same contracts as train/packed.py's PackedFoldTrainer /
PackedMultiFoldTrainer (reference hot loop
multimodal_kfold_train_cvae_supervised.py:177-199), with the
StackedMultimodalCVAE pad-to-widest layout replaced by
models/grouped.GroupedStackedCVAE: hidden layers stay one batched einsum
over all modalities, the width-dependent layer-0/decoder-head ops run
per width group at exact width — zero padded FLOPs on mixed-width cohorts
(the flagship regime where the padded layout's +22% single-fold win
inverted to −21% under the 5-fold vmap, RESULTS.md round-2).

PRNG streams match PackedFoldTrainer / FoldTrainer exactly (same
per-epoch/per-step splits, one [B, Z] reparameterization draw), so
trajectories agree to float-reorder tolerance.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.grouped import GroupedStackedCVAE
from .packed import PackedFoldTrainer, PackedMultiFoldTrainer
from .trainer import TrainConfig


def make_grouped_fold_batches(grouped: GroupedStackedCVAE,
                              data_list: Sequence[np.ndarray],
                              cov: np.ndarray, batch_size: int) -> dict:
    """Per-modality arrays -> {x: tuple per width group [NB, G_g, B, d_g],
    c [NB, B, C], mask [NB, B], valid [NB]} (packed once on the host)."""
    n = data_list[0].shape[0]
    nb = max(1, -(-n // batch_size))
    padded = nb * batch_size

    def pack_rows(a):
        a = np.asarray(a, np.float32)
        out = np.zeros((padded,) + a.shape[1:], np.float32)
        out[:n] = a
        return out.reshape((nb, batch_size) + a.shape[1:])

    x_groups = []
    for _, idx in grouped.groups:
        x_groups.append(np.stack([pack_rows(data_list[m]) for m in idx],
                                 axis=1))           # [NB, G_g, B, d_g]
    mask = np.zeros((padded,), np.float32)
    mask[:n] = 1.0
    mask = mask.reshape(nb, batch_size)
    return {
        "x": tuple(x_groups),
        "c": pack_rows(cov),
        "mask": mask,
        "valid": mask.sum(axis=1) > 0,
    }


def _grouped_loss_fn(grouped: GroupedStackedCVAE, combine: str,
                     precision: str = "fp32"):
    if precision == "bf16":
        # trainer.default_loss_fn's bf16 recipe on the grouped layout:
        # matmuls in bfloat16 (fp32 master), latent stats upcast, recon
        # means stay bf16 (elementwise loss promote fuses inline)
        from .trainer import _full_cast, _half_cast

        def loss_fn(p, batch, k):
            p16 = _half_cast(p)
            x16 = tuple(x.astype(jnp.bfloat16) for x in batch["x"])
            fwd = grouped.forward(p16, x16,
                                  batch["c"].astype(jnp.bfloat16), k,
                                  combine)
            fwd = {k_: (_full_cast(v) if k_ != "recon_means" else v)
                   for k_, v in fwd.items()}
            losses = grouped.loss(p, batch["x"], fwd, batch["mask"])
            return losses["total"], losses

        return loss_fn

    def loss_fn(p, batch, k):
        fwd = grouped.forward(p, batch["x"], batch["c"], k, combine)
        losses = grouped.loss(p, batch["x"], fwd, batch["mask"])
        return losses["total"], losses

    return loss_fn


def _build_grouped(model):
    variant = getattr(model, "variant", None)
    if variant not in ("cvae", "mmjsd", "mvtcae", "nmmlp"):
        raise ValueError(
            f"grouped layout supports the cvae skeleton "
            f"(cvae/mmjsd/mvtcae/nmmlp), got {variant!r}")
    return GroupedStackedCVAE(
        model.input_dim_list, model.hidden_dim, model.latent_dim,
        model.c_dim, model.modalities, model.non_linear, variant=variant,
        jsd_on_fused=getattr(model, "jsd_on_fused", True))


class GroupedFoldTrainer(PackedFoldTrainer):
    """Sequential whole-fold trainer on the grouped layout — the
    PackedFoldTrainer plumbing with the layout hooks swapped."""

    _batch_maker = staticmethod(make_grouped_fold_batches)
    _loss_builder = staticmethod(_grouped_loss_fn)

    def _build_stacked(self, model):
        return _build_grouped(model)

    def _loss_name(self) -> str:
        v = self.stacked.variant
        return "packed_grouped" if v == "cvae" else f"packed_grouped_{v}"


class GroupedMultiFoldTrainer(PackedMultiFoldTrainer):
    """vmap(grouped whole-fold trainer) over a stacked fold axis — the
    full PackedMultiFoldTrainer contract (run / compile / run_milestones /
    run_resumable) on the pad-free layout. With ``mesh``/``shardings_fn``
    (a ('fold','modality','data') mesh +
    parallel/modality.grouped_fold_shardings) the program additionally
    shards folds, each divisible width-group axis over 'modality'
    (ragged groups replicate — the groups are separable by construction),
    and batch rows over 'data' (round 5: EP composed with the grouped
    layout)."""

    _batch_maker = staticmethod(make_grouped_fold_batches)
    _loss_builder = staticmethod(_grouped_loss_fn)

    def _build_stacked(self, model):
        return _build_grouped(model)

    def _loss_name(self) -> str:
        v = self.stacked.variant
        return "packed_grouped" if v == "cvae" else f"packed_grouped_{v}"

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 mesh=None, shardings_fn=None):
        super().__init__(model, config, n_samples, mesh=mesh,
                         shardings_fn=shardings_fn)


def grouped_routing(model) -> bool:
    """Whether --packed_xla should ride the grouped layout for this model:
    a cvae-skeleton cohort (cvae/mmjsd/mvtcae/nmmlp — round 5 extended
    beyond cvae) with >1 distinct modality width (uniform widths make the
    padded layout identical and strictly simpler)."""
    from ..models.grouped import width_groups

    return (getattr(model, "variant", None) in ("cvae", "mmjsd", "mvtcae",
                                                "nmmlp")
            and len(width_groups(model.input_dim_list)) > 1)


def select_packed_trainer(model, fold_parallel: bool):
    """ONE owner for the --packed_xla layout routing used by
    cli/train_supervised, cli/sweep_supervised and common.run_folds:
    (trainer_cls, layout_name, layout_tag) with layout_tag in
    {'padded', 'grouped', 'dmvae'} keying the resumable-state dirname
    (each layout's state pytree is its own trajectory family)."""
    if getattr(model, "variant", None) in ("dmvae", "weighted",
                                           "mmvaeplus"):
        from .grouped_dmvae import (
            GroupedDMVAEFoldTrainer,
            GroupedDMVAEMultiFoldTrainer,
        )

        cls = (GroupedDMVAEMultiFoldTrainer if fold_parallel
               else GroupedDMVAEFoldTrainer)
        return cls, "split-latent grouped", "dmvae"
    g = grouped_routing(model)
    if fold_parallel:
        cls = GroupedMultiFoldTrainer if g else PackedMultiFoldTrainer
    else:
        cls = GroupedFoldTrainer if g else PackedFoldTrainer
    return cls, ("width-grouped" if g else "packed"), (
        "grouped" if g else "padded")


def notice_stale_padded_state(state_dir, layout, fold: "int | None" = None,
                              stale_dirname: "str | None" = None,
                              new_dirname: "str | None" = None) -> None:
    """Routing-migration notice (round 4): a pre-round-4 --packed_xla run on
    a mixed-width cohort wrote its resumable state to the PADDED layout's
    dir; the same cohort now routes to the grouped layout, which reads (and
    writes) its own dir — the old state is never opened, so a --resume
    starts fresh. That restart is correct (the layout change is a numerics
    change), but say so instead of silently orphaning the old state.
    ``stale_dirname``/``new_dirname`` override the dir names for surfaces
    with their own naming (the EP branch's ep-packed-state ->
    ep-grouped-state rename)."""
    if layout in (False, "padded", "dmvae"):
        return  # padded reads its own state; dmvae never had a padded era
    from pathlib import Path

    stale = Path(state_dir) / (stale_dirname
                               or packed_state_dirname("padded", fold))
    if stale.exists():
        new = new_dirname or packed_state_dirname("grouped", fold)
        print(
            f'note: leftover padded-layout resume state at {stale} — this '
            'mixed-width cohort now routes to the width-grouped layout '
            f'(state dir {new!r}), whose numerics differ, so training '
            '(re)starts from the grouped state; the padded state is '
            'ignored and can be deleted')


def packed_state_dirname(layout, fold: "int | None" = None) -> str:
    """Resumable-state dir naming shared by every --packed_xla surface
    (layout-specific: the state pytrees differ between layouts). ``layout``
    is a select_packed_trainer tag; booleans mean grouped/padded
    (pre-round-5 callers)."""
    if isinstance(layout, bool):
        layout = "grouped" if layout else "padded"
    base = {"grouped": "grouped-state", "padded": "packed-state",
            "dmvae": "grouped-dmvae-state"}[layout]
    return base if fold is None else f"{fold:03d}-{base}"
