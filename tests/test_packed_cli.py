"""--packed_xla: batched-einsum modality packing on the XLA path —
trajectory parity with the per-modality trainer, fold-parallel composition,
and CLI wiring."""
import argparse

import jax
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import train_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig
from multi_modal_normative_modeling_tpu.train.packed import (
    PackedFoldTrainer,
    PackedMultiFoldTrainer,
    packed_supported,
)

DIMS = [20, 12, 16]
C = 3


def _problem(n=19, seed=0):
    rng = np.random.default_rng(seed)
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(n, C)).astype(np.float32)
    return data, cov


def test_packed_trainer_matches_per_modality_trajectory():
    model = build_model("cVAE_multimodal", DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=12, batch_size=8, combine="gpoe")
    data, cov = _problem()
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    ref = FoldTrainer(model, config, 19)
    p_ref, logs_ref = ref.run(params, data, [cov] * len(DIMS), key=key)
    packed = PackedFoldTrainer(model, config, 19)
    p_pk, logs_pk = packed.run(params, data, cov, key=key)

    np.testing.assert_allclose(logs_pk["total"], np.asarray(logs_ref["total"]),
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        p_pk, p_ref)


def test_packed_fold_parallel_matches_sequential_packed():
    model = build_model("cVAE_multimodal", DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=8, batch_size=8, combine="moe")
    folds = []
    for s in (1, 2):
        data, cov = _problem(n=17 + s, seed=s)
        folds.append((data, [cov] * len(DIMS)))
    params_list = [model.init_params(jax.random.PRNGKey(f)) for f in range(2)]
    keys = [jax.random.PRNGKey(42) for _ in range(2)]

    seq = PackedFoldTrainer(model, config, 19)
    seq_out = [seq.run(params_list[f], folds[f][0], folds[f][1][0],
                       key=keys[f]) for f in range(2)]

    pmft = PackedMultiFoldTrainer(model, config, 19)
    par_params, par_logs = pmft.run(params_list, folds, keys)

    for f in range(2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            par_params[f], seq_out[f][0])
        np.testing.assert_allclose(par_logs[f]["total"],
                                   seq_out[f][1]["total"], rtol=1e-5)


def test_packed_supported_pre_checks():
    model = build_model("cVAE_multimodal", DIMS, [10, 8], 4, C, len(DIMS))
    assert packed_supported(model, TrainConfig(combine="gpoe"))[0]
    # round 4: bf16 packs for the cvae variant (fp32 master params);
    # non-cvae skeleton variants stay fp32-only, fp16 is refused
    assert packed_supported(model, TrainConfig(combine="gpoe",
                                               precision="bf16"))[0]
    mmjsd = build_model("mmJSD", DIMS, [10, 8], 4, C, len(DIMS))
    ok, reason = packed_supported(mmjsd, TrainConfig(combine="gpoe",
                                                     precision="bf16"))
    assert not ok and "bf16" in reason
    ok, reason = packed_supported(model, TrainConfig(combine="gpoe",
                                                     precision="fp16"))
    assert not ok and "precision" in reason
    ok, reason = packed_supported(model, TrainConfig(combine="gpoe",
                                                     shuffle=True))
    assert not ok and "shuffle" in reason
    # round 5: the DMVAE family packs too (its own split-latent grouped
    # layout — contract pinned in test_packed_zoo.py); bf16 stays refused
    dmvae = build_model("DMVAE", DIMS, [10, 8], 6, C, len(DIMS))
    assert packed_supported(dmvae, TrainConfig(combine="poe"))[0]
    assert not packed_supported(dmvae, TrainConfig(combine="poe",
                                                   precision="bf16"))[0]
    # fused path rejects shuffle too (fixed batch order)
    from multi_modal_normative_modeling_tpu.train.fused import supported

    ok, reason = supported(model, TrainConfig(combine="gpoe", shuffle=True),
                           256)
    assert not ok and "shuffle" in reason


def test_cli_packed_with_checkpoint_every(tmp_path, capsys):
    """--packed_xla + --checkpoint_every train on the packed path (formerly
    a per-modality fallback) and leave the packed resumable state."""
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[12, 12, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", packed_xla=True, checkpoint_every=2,
    )
    train_supervised.main(args, project_root=root)
    out = capsys.readouterr().out
    assert "packed modalities" in out
    assert "packed XLA path unavailable" not in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    for fold in range(2):
        assert (model_dir / f"{fold:03d}" / "cVAE_model.ckpt").exists()
        assert train_state_exists(model_dir / f"{fold:03d}-packed-state")


def test_cli_packed_warmup_compiles_packed_program(tmp_path, capsys):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[12, 12, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", packed_xla=True, fold_parallel=True,
        warmup_only=True,
    )
    train_supervised.main(args, project_root=root)
    out = capsys.readouterr().out
    assert "packed fold-parallel train program compiled" in out
    # warmup compiles, never trains
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert not (model_dir / "000" / "cVAE_model.ckpt").exists()


def test_cli_packed_pipeline(tmp_path, capsys):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 15, 1: 15},
                            effect=0.8)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=8, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", packed_xla=True, fold_parallel=True,
    )
    train_supervised.main(args, project_root=root)
    out = capsys.readouterr().out
    assert "packed modalities" in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()
    assert (model_dir / "001" / "cVAE_model.ckpt").exists()
