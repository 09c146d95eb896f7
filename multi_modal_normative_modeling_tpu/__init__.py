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
