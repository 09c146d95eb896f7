"""--ep_mesh CLI wiring: expert-parallel training from the drop-in train
entry point (fusion-as-collectives over a modality x data device mesh)."""
import argparse

import pytest

from multi_modal_normative_modeling_tpu.cli import train_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def _args(**over):
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[12, 12, 4],
        procedure="UCA-gPoE", combine="gPoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", in_memory_fusion=True,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_cli_ep_mesh_trains_and_resumes(tmp_path, capsys):
    """UCA gives 4 modalities: a (4 modality, 2 data) mesh over the 8
    virtual devices trains every fold expert-parallel, emits the standard
    artifacts, and leaves the EP resumable state."""
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device test platform")
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    train_supervised.main(_args(ep_mesh="4,2", checkpoint_every=2),
                          project_root=root)
    out = capsys.readouterr().out
    assert "expert-parallel modalities" in out
    assert "mesh {'modality': 4, 'data': 2}" in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    for fold in range(2):
        assert (model_dir / f"{fold:03d}" / "cVAE_model.ckpt").exists()
        assert train_state_exists(model_dir / f"{fold:03d}-ep-state")


def test_cli_ep_mesh3_fold_parallel_gspmd(tmp_path, capsys):
    """--ep_mesh F,M,D: all folds fold-parallel with the modality axis GSPMD-
    sharded. This cohort is mixed-width (UCA), so round 5 routes it onto
    the width-grouped EP form with its own resumable state dir; a
    uniform-width (SE) run keeps the padded form + ep-packed-state."""
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device test platform")
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    train_supervised.main(_args(ep_mesh="2,2,2", checkpoint_every=2),
                          project_root=root)
    out = capsys.readouterr().out
    assert "fold-parallel, expert-parallel width-grouped modalities" in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    for fold in range(2):
        assert (model_dir / f"{fold:03d}" / "cVAE_model.ckpt").exists()
    assert train_state_exists(model_dir / "ep-grouped-state")
    # (the padded GSPMD EP form stays covered by
    # test_packed_zoo.py::test_three_axis_gspmd_ep_accepts_mmjsd and the
    # 2-axis EPFoldTrainer tests — no F,M,D grid with the SE cohort's
    # 3 modalities fills the 8 virtual devices)


def test_cli_ep_mesh_conflicts_and_gates(tmp_path):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    with pytest.raises(SystemExit, match="mutually exclusive"):
        train_supervised.main(_args(ep_mesh="4,2", fold_parallel=True),
                              project_root=root)
    with pytest.raises(SystemExit, match="takes 2 or 3 axis sizes"):
        train_supervised.main(_args(ep_mesh="4"), project_root=root)
    with pytest.raises(SystemExit, match="visible devices"):
        train_supervised.main(_args(ep_mesh="4,200"), project_root=root)
    # 3 modalities (SE) don't divide a 4-way modality axis -> loud failure
    import jax

    if len(jax.devices()) == 8:
        with pytest.raises(SystemExit, match="not divisible"):
            train_supervised.main(
                _args(ep_mesh="4,2", procedure="SE-gPoE",
                      in_memory_fusion=False), project_root=root)


def test_ep_mesh_divisibility_gates():
    """The shared validator (cli/common.py) mirrors every runtime gate:
    fold axis (3-axis), modality axis (both), data axis (2-axis only —
    the 3-axis path lets GSPMD place uneven batch shards)."""
    from multi_modal_normative_modeling_tpu.cli.common import (
        ep_mesh_divisibility,
    )

    ok = ep_mesh_divisibility
    assert ok([2, 2], n_folds=10, batch_size=8, modalities=4) is None
    assert ok([2, 2, 2], n_folds=10, batch_size=8, modalities=4) is None
    assert "folds not divisible" in ok([3, 2, 2], 10, 8, 4)
    assert "modalities not divisible" in ok([4, 2], 10, 8, 3)
    assert "modalities not divisible" in ok([2, 4, 1], 10, 8, 3)
    assert "batch_size 7 not divisible" in ok([2, 2], 10, 7, 4)
    # 3-axis batch sharding is GSPMD's job: no batch gate
    assert ok([2, 2, 2], n_folds=10, batch_size=7, modalities=4) is None
    # dual-bank override (nmpmcont: the EP axis is [2M], not [M])
    assert ok([2, 2, 2], 10, 8, 3, modality_axis_len=6,
              modality_axis_desc="dual-bank axis 2M") is None
    msg = ok([2, 4, 2], 10, 8, 3, modality_axis_len=6,
             modality_axis_desc="dual-bank axis 2M")
    assert "dual-bank axis 2M=6 not divisible" in msg


def test_ep_mesh_test_stage_matches_plain(tmp_path):
    """--ep_mesh on the test stage: the packed expert-parallel inference
    program (fold x modality x rows GSPMD) reproduces the per-modality
    vmapped program's deviation CSVs to fusion-reorder float tolerance
    (same per-fold PRNG streams, SURVEY.md Q2)."""
    import shutil

    import jax
    import numpy as np
    import pandas as pd

    from multi_modal_normative_modeling_tpu.cli import test_supervised

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device test platform")

    plain_root = tmp_path / "plain"
    make_synthetic_resource(plain_root, "ADNI", n_hc=30,
                            n_disease={0: 10, 1: 10})
    train_supervised.main(_args(), project_root=plain_root)
    ep_root = tmp_path / "ep"
    shutil.copytree(plain_root, ep_root)  # identical checkpoints/cohort

    test_supervised.main(_args(), project_root=plain_root)
    test_supervised.main(_args(ep_mesh="2,2,2"), project_root=ep_root)

    rel = ("deviation/supervised_cvae/ADNI/UCA-gPoE/path_model/"
           "early_fusion_modalities_ADNI/"
           "reconstruction_error_early_fusion_modalities_ADNI.csv")
    plain = pd.read_csv(plain_root / rel)
    ep = pd.read_csv(ep_root / rel)
    assert list(plain["participant_id"]) == list(ep["participant_id"])
    np.testing.assert_allclose(ep["Reconstruction error"],
                               plain["Reconstruction error"],
                               rtol=1e-3, atol=1e-6)
    # the 2-axis (modality, data) form works too and matches
    ep2_root = tmp_path / "ep2"
    shutil.copytree(plain_root, ep2_root)
    # plain test artifacts were written into plain_root after the copy for
    # ep_root, so remove any stale deviation dir defensively
    shutil.rmtree(ep2_root / "deviation", ignore_errors=True)
    test_supervised.main(_args(ep_mesh="4,2"), project_root=ep2_root)
    ep2 = pd.read_csv(ep2_root / rel)
    np.testing.assert_allclose(ep2["Reconstruction error"],
                               plain["Reconstruction error"],
                               rtol=1e-3, atol=1e-6)


def test_ep_mesh_test_stage_gates(tmp_path):
    import jax

    from multi_modal_normative_modeling_tpu.cli import test_supervised

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device test platform")
    make_synthetic_resource(tmp_path, "ADNI", n_hc=30, n_disease={0: 10})
    train_supervised.main(_args(), project_root=tmp_path)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        test_supervised.main(_args(ep_mesh="4,2", mesh="2,4"),
                             project_root=tmp_path)
    # 4 modalities don't divide an 8-way modality axis -> loud failure
    with pytest.raises(SystemExit, match="not divisible"):
        test_supervised.main(_args(ep_mesh="1,8,1"), project_root=tmp_path)
