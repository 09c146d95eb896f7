"""multi_modal_normative_modeling_tpu — a TPU-native (JAX/XLA/Pallas/pjit)
framework for multi-modal normative modeling of neuroimaging data.

Re-designed from scratch for TPU with the capabilities of the reference
pipeline (soz223/multi_modal_normative_modeling): conditional VAEs with
per-modality encoder/decoder MLPs, expert-fusion latents (PoE/gPoE/MoE/MoPoE
and friends), k-fold cross-validated normative training, deviation-score
inference, disease-classification group analysis, end-to-end diagnosis heads,
and continuous-score regression heads.

TPU-first design highlights (vs. the reference's single-device PyTorch loop):
  * pure-functional parameter pytrees -> `vmap` over CV folds trains every
    fold concurrently on one chip (parallel/folds.py)
  * one jitted training step scanning epochs x batches on-device; zero
    host<->device traffic inside the hot loop (train/trainer.py)
  * `jax.sharding.Mesh` axes (fold, data) scale folds and batch across
    chips over ICI (parallel/mesh.py)
  * fused Pallas TPU kernels for the cVAE forward + ELBO hot path
    (kernels/), with jnp fallbacks that run anywhere.

Layer map mirrors SURVEY.md section 7:
  registry.py  - dataset/column/procedure registries (utils.py:699-774)
  data/        - CSV ingestion, k-fold ids, scaling, covariate encoding (L0)
  ops/         - fusion ops, losses, MLP stacks (cVAE.py building blocks)
  models/      - the model zoo (cVAE.py:1087-2346 winning definitions)
  kernels/     - Pallas TPU kernels + jnp fallbacks
  parallel/    - fold-stacking, meshes, shardings
  train/       - jitted trainers, LR schedules, checkpoints (L3)
  infer/       - deviation engine + CSV emitters (L3/L4)
  evaluation/  - ROC/AUC/Youden metrics + report writers (L4)
  cli/         - argparse entry points with the reference flag surface (L5)
"""

__version__ = "0.1.0"

# ---------------------------------------------------------------------------
# Lazy public API (PEP 562): `import multi_modal_normative_modeling_tpu` stays
# free of jax/numpy imports (CLIs and tests pick their backend first — see
# utils/jaxconfig.py for why eager backend selection is load-bearing on this
# image); attribute access pulls the submodule on demand.
# ---------------------------------------------------------------------------
_PUBLIC_API = {
    # model zoo (reference registry names, cVAE.py:1087-2346 winning defs)
    "build_model": "models",
    "MultimodalCVAE": "models",
    "DMVAEFamily": "models",
    # training engines + checkpoints
    "TrainConfig": "train",
    "FoldTrainer": "train",
    "train_single_fold": "train",
    "make_batches": "train",
    "save_checkpoint": "train",
    "load_checkpoint": "train",
    "checkpoint_exists": "train",
    # fold-parallel / mesh scale-out
    "MultiFoldTrainer": "parallel",
    "make_mesh": "parallel",
    "make_mesh3": "parallel",
    "stack_params": "parallel",
    "stack_fold_batches": "parallel",
    # deviation math (utils_vae.py:147-174 semantics)
    "reconstruction_deviation": "infer",
    "reconstruction_deviation_roi": "infer",
    "latent_deviation": "infer",
    "separate_latent_deviation": "infer",
    "latent_pvalues": "infer",
    "DeviationEmitter": "infer",
    # fold-ensemble scoring of new subjects (serving/export core)
    "load_ensemble": "infer.ensemble",
    "EnsembleState": "infer.ensemble",
    # dataset/procedure registry (utils.py:699-774 semantics)
    "get_datasets_name": "registry",
    "get_column_name": "registry",
    "get_hc_label": "registry",
}

_SUBMODULES = ("data", "evaluation", "infer", "kernels", "models", "native",
               "ops", "parallel", "registry", "train", "utils", "viz")

__all__ = sorted(_PUBLIC_API) + list(_SUBMODULES)


def __getattr__(name):
    import importlib

    if name in _PUBLIC_API:
        module = importlib.import_module(f".{_PUBLIC_API[name]}", __name__)
        value = getattr(module, name)
        globals()[name] = value  # cache: next access skips __getattr__
        return value
    if name in _SUBMODULES:
        module = importlib.import_module(f".{name}", __name__)
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
