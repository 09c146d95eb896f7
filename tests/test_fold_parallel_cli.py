"""--fold_parallel trains all folds in one vmapped program and produces the
same downstream AUC as the sequential path."""
import argparse

import numpy as np

from multi_modal_normative_modeling_tpu.cli import (
    group_analysis,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def _args(**overrides):
    base = dict(
        dataset_resourse="ADNI",
        hz_para_list=[24, 24, 6],
        procedure="SM-av45",
        combine="PoE",
        epochs=25,
        n_splits=3,
        oversample_percentage=1,
        model="cVAE_multimodal",
        single_modality=None,
        base_learning_rate=0.0001,
        max_learning_rate=0.005,
        training_class="nm",
        lr_schedule="constant",
        fold_parallel=False,
        precision="fp32",
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def test_fold_parallel_matches_sequential_auc(tmp_path):
    seq_root = tmp_path / "seq"
    par_root = tmp_path / "par"
    for root in (seq_root, par_root):
        make_synthetic_resource(root, "ADNI", n_hc=60,
                                n_disease={0: 30, 1: 30}, effect=1.0)

    seq_args = _args()
    train_supervised.main(seq_args, project_root=seq_root)
    test_supervised.main(seq_args, project_root=seq_root)
    seq_stats = group_analysis.main(seq_args, project_root=seq_root)

    par_args = _args(fold_parallel=True)
    train_supervised.main(par_args, project_root=par_root)
    test_supervised.main(par_args, project_root=par_root)
    par_stats = group_analysis.main(par_args, project_root=par_root)

    # identical synthetic cohorts + identical numerics => identical AUCs
    np.testing.assert_allclose(par_stats["auc"], seq_stats["auc"],
                               atol=1e-6)


def test_mesh_flag_tensor_parallel_matches_unmeshed(tmp_path):
    """--mesh F,D,M shards the fold-parallel program over the virtual
    8-device mesh (tensor-parallel weights); downstream numerics match the
    unmeshed fold-parallel run to partial-sum-order tolerance."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")

    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        load_checkpoint,
    )

    plain_root = tmp_path / "plain"
    mesh_root = tmp_path / "mesh"
    for root in (plain_root, mesh_root):
        make_synthetic_resource(root, "ADNI", n_hc=60,
                                n_disease={0: 30, 1: 30}, effect=1.0)

    plain_args = _args(fold_parallel=True, n_splits=2,
                       hz_para_list=[16, 16, 4], epochs=8)
    train_supervised.main(plain_args, project_root=plain_root)

    mesh_args = _args(fold_parallel=True, n_splits=2,
                      hz_para_list=[16, 16, 4], epochs=8, mesh="2,2,2")
    train_supervised.main(mesh_args, project_root=mesh_root)

    for fold in ("000", "001"):
        plain_params, _ = load_checkpoint(
            plain_root / "outputs/kfold_analysis/supervised_cvae" / fold)
        mesh_params, _ = load_checkpoint(
            mesh_root / "outputs/kfold_analysis/supervised_cvae" / fold)
        import jax.tree_util as jtu
        jtu.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            plain_params, mesh_params)

    test_supervised.main(mesh_args, project_root=mesh_root)
    stats = group_analysis.main(mesh_args, project_root=mesh_root)
    assert np.isfinite(stats["auc"]).all()


def test_test_stage_mesh_matches_unmeshed(tmp_path):
    """test-stage --mesh F,D shards the vmapped inference program; emitted
    deviations match the single-device run (rows are independent, features
    unsharded — identical math per row)."""
    import pandas as pd

    root = tmp_path / "proj"
    make_synthetic_resource(root, "ADNI", n_hc=60,
                            n_disease={0: 30, 1: 30}, effect=1.0)
    args = _args(fold_parallel=True, n_splits=2, hz_para_list=[16, 16, 4],
                 epochs=8)
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    dev_dir = (root / "deviation" / "supervised_cvae" / "ADNI" / "SM-av45" /
               "path_model")
    plain = {p.relative_to(dev_dir): pd.read_csv(p)
             for p in dev_dir.rglob("*.csv")}
    assert plain

    test_supervised.main(_args(fold_parallel=True, n_splits=2,
                               hz_para_list=[16, 16, 4], epochs=8,
                               mesh="2,4"), project_root=root)
    for name, frame in plain.items():
        meshed = pd.read_csv(dev_dir / name)
        num = frame.select_dtypes("number").columns
        np.testing.assert_allclose(meshed[num].values, frame[num].values,
                                   rtol=1e-5, atol=1e-7)
        assert list(meshed.columns) == list(frame.columns)

    import pytest

    with pytest.raises(SystemExit, match="visible devices"):
        test_supervised.main(_args(fold_parallel=True, n_splits=2,
                                   hz_para_list=[16, 16, 4], epochs=8,
                                   mesh="3,5"), project_root=root)


def test_mesh_flag_validation():
    """--mesh without --fold_parallel, or with a bad axis product, exits
    with an actionable message."""
    import pytest

    args = _args(fold_parallel=False, mesh="2,4")
    with pytest.raises(SystemExit, match="fold_parallel"):
        train_supervised.main(args, project_root=".")

    from multi_modal_normative_modeling_tpu.cli import common

    with pytest.raises(SystemExit, match="visible devices"):
        common.parse_mesh("3,5", n_folds=3, batch_size=256)
    with pytest.raises(SystemExit, match="not divisible"):
        common.parse_mesh("4,2", n_folds=3, batch_size=256)
    # (-2)*(-4) == 8 passes the product check; must still be rejected
    with pytest.raises(SystemExit, match="positive"):
        common.parse_mesh("-2,-4", n_folds=10, batch_size=256)
