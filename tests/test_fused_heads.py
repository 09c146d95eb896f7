"""Merged mu/logvar encoder heads (train/trainer.fused_heads_loss_fn):
value/gradient parity with the default loss and the CLI opt-in."""
import jax
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import (
    FoldTrainer,
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.train.trainer import (
    default_loss_fn,
    fused_heads_loss_fn,
    make_batches,
)


@pytest.mark.parametrize("combine", ["gpoe", "poe", "moe", "mopoe"])
def test_fused_heads_loss_matches_default(combine):
    dims = [24, 40, 16]
    model = build_model("cVAE_multimodal", dims, [12, 12], 6, 5, len(dims))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    n = 20
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
    cov = [rng.normal(size=(n, 5)).astype(np.float32)] * len(dims)
    batches = make_batches(data, cov, batch_size=16)
    batch = jax.tree_util.tree_map(lambda a: a[1], batches)  # ragged batch
    key = jax.random.PRNGKey(7)

    # the REFERENCE side must pin fused_heads=False: merged heads are the
    # default, so a default-config reference would be the fused loss itself
    # and the parity check would be vacuous
    plain_cfg = TrainConfig(epochs=1, batch_size=16, combine=combine,
                            fused_heads=False)
    config = TrainConfig(epochs=1, batch_size=16, combine=combine)
    (ref_total, ref_aux), ref_grads = jax.value_and_grad(
        default_loss_fn(model, plain_cfg), has_aux=True)(params, batch, key)
    (got_total, got_aux), got_grads = jax.value_and_grad(
        fused_heads_loss_fn(model, config), has_aux=True)(params, batch, key)

    np.testing.assert_allclose(float(got_total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(got_aux["kl"]), float(ref_aux["kl"]),
                               rtol=1e-5, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        got_grads, ref_grads)


def test_fused_heads_default_trajectory_tracks_two_matmul_loss():
    """fused_heads=True is the DEFAULT for cvae/fp32 (default_loss_fn);
    its trajectory stays float-close to the two-matmul loss
    (fused_heads=False), and exact on CPU."""
    dims = [24, 16]
    model = build_model("cVAE_multimodal", dims, [12, 12], 6, 5, len(dims))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    data = [rng.normal(size=(40, d)).astype(np.float32) for d in dims]
    cov = [rng.normal(size=(40, 5)).astype(np.float32)] * len(dims)
    plain_cfg = TrainConfig(epochs=4, batch_size=16, combine="gpoe",
                            fused_heads=False)
    fused_cfg = TrainConfig(epochs=4, batch_size=16, combine="gpoe")

    p1, logs1 = FoldTrainer(model, plain_cfg, 40).run(params, data, cov)
    p2, logs2 = FoldTrainer(model, fused_cfg, 40).run(params, data, cov)
    np.testing.assert_allclose(logs2["total"], logs1["total"], rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5),
        p2, p1)


def test_default_loss_gates_fused_heads():
    """default_loss_fn routes to the merged-head loss only for cvae+fp32
    with fused_heads on; bf16 and fused_heads=False keep the plain path."""
    model = build_model("cVAE_multimodal", [8, 8], [6], 3, 2, 2)
    on = default_loss_fn(model, TrainConfig())
    off = default_loss_fn(model, TrainConfig(fused_heads=False))
    bf = default_loss_fn(model, TrainConfig(precision="bf16"))
    assert on.__qualname__.startswith("fused_heads_loss_fn")
    assert not off.__qualname__.startswith("fused_heads_loss_fn")
    assert not bf.__qualname__.startswith("fused_heads_loss_fn")


def test_fused_heads_rejects_unsupported():
    model = build_model("cVAE_multimodal", [8], [6], 3, 2, 1)
    with pytest.raises(ValueError, match="fp32"):
        fused_heads_loss_fn(model, TrainConfig(precision="bf16"))
    dm = build_model("DMVAE", [8, 8], [6], 3, 2, 2)
    with pytest.raises(ValueError, match="cvae"):
        fused_heads_loss_fn(dm, TrainConfig())


def test_resume_refuses_loss_family_mismatch(tmp_path):
    """A checkpointed run resumed under a DIFFERENT loss family (merged
    heads vs --no_fused_heads) is refused with an actionable error — a
    mixed-numerics trajectory would match neither config."""
    dims = [24, 16]
    model = build_model("cVAE_multimodal", dims, [12, 12], 6, 5, len(dims))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    data = [rng.normal(size=(40, d)).astype(np.float32) for d in dims]
    cov = [rng.normal(size=(40, 5)).astype(np.float32)] * len(dims)
    key = jax.random.PRNGKey(9)

    fused_cfg = TrainConfig(epochs=2, batch_size=16, combine="gpoe")
    FoldTrainer(model, fused_cfg, 40).run_resumable(
        params, data, cov, key, tmp_path, checkpoint_every=2)

    plain_cfg = TrainConfig(epochs=4, batch_size=16, combine="gpoe",
                            fused_heads=False)
    with pytest.raises(ValueError, match="refusing to resume"):
        FoldTrainer(model, plain_cfg, 40).run_resumable(
            params, data, cov, key, tmp_path, checkpoint_every=2,
            resume=True)
    # matching config resumes fine
    FoldTrainer(model, TrainConfig(epochs=4, batch_size=16, combine="gpoe"),
                40).run_resumable(params, data, cov, key, tmp_path,
                                  checkpoint_every=2, resume=True)


def test_fused_heads_cli_pipeline(tmp_path):
    """The merged-head default trains working checkpoints through the CLI
    (fold-parallel), --no_fused_heads also trains clean, and the test
    stage runs on both."""
    import argparse

    from multi_modal_normative_modeling_tpu.cli import (
        test_supervised,
        train_supervised,
    )
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=30, n_disease={0: 10})
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=True, precision="fp32",
    )
    train_supervised.main(args, project_root=tmp_path)
    model_dir = tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()
    args.fold_parallel = False
    test_supervised.main(args, project_root=tmp_path)
    dev = (tmp_path / "deviation" / "supervised_cvae" / "ADNI" / "SE-gPoE"
           / "path_model" / "av45" / "reconstruction_error_av45.csv")
    assert dev.exists()
    # escape hatch trains clean too
    args.no_fused_heads = True
    args.fold_parallel = True
    train_supervised.main(args, project_root=tmp_path)
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()
