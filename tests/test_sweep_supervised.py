"""The supervised whole-grid sweep engine (cli/sweep_supervised.py) produces
grid points identical to separate sequential train/test/analysis launches:
the epochs axis collapses into one milestone-snapshotted run, and the lr
axis dedupes under the reference's constant effective LR (SURVEY.md Q1)."""
import argparse
import json

import jax
import numpy as np

from multi_modal_normative_modeling_tpu import registry
from multi_modal_normative_modeling_tpu.cli import (
    group_analysis,
    sweep_supervised,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.train import load_checkpoint


def _point_args(epochs, hz, fold_parallel=False):
    return argparse.Namespace(
        dataset_resourse="ADNI",
        hz_para_list=list(hz),
        procedure="SM-av45",
        combine="PoE",
        epochs=epochs,
        n_splits=3,
        oversample_percentage=1,
        model="cVAE_multimodal",
        single_modality=None,
        base_learning_rate=0.0001,
        max_learning_rate=0.005,
        training_class="nm",
        lr_schedule="constant",
        fold_parallel=fold_parallel,
        precision="fp32",
    )


def _sweep_args(**overrides):
    base = dict(
        dataset_resourse="ADNI",
        n_splits=3,
        oversample_percentage=1,
        model="cVAE_multimodal",
        training_class="nm",
        combine="PoE",
        procedures=["SM-av45"],
        epochs_list=[4, 9],
        hz_grid="16 6;24 24 6",
        lr_grid="1e-4:5e-3,9e-9:9e-9",
        lr_schedule="constant",
        precision="fp32",
        in_memory_fusion=False,
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def test_sweep_matches_sequential_grid(tmp_path):
    """Every (hz, E) grid point's checkpoints and AUCs equal the standalone
    CLI chain run at that exact config."""
    sweep_root = tmp_path / "sweep"
    seq_root = tmp_path / "seq"
    for root in (sweep_root, seq_root):
        make_synthetic_resource(root, "ADNI", n_hc=48,
                                n_disease={0: 24, 1: 24}, effect=1.0)

    records = sweep_supervised.main(_sweep_args(), project_root=sweep_root)

    # 2 shapes x 2 epoch counts x 2 lr pairs = 8 points, half deduped
    assert len(records) == 8
    deduped = [r for r in records if "deduped_from" in r]
    assert len(deduped) == 4
    summary = json.loads(
        (sweep_root / "outputs" / "sweep_supervised_results.json").read_text())
    assert len(summary) == 8

    # sequential oracle: last grid point (hz=[24,24,6], E=9) — the sweep's
    # final state on disk corresponds to it, so checkpoints must match too
    seq_args = _point_args(9, [24, 24, 6])
    train_supervised.main(seq_args, project_root=seq_root)
    test_supervised.main(seq_args, project_root=seq_root)
    seq_stats = group_analysis.main(seq_args, project_root=seq_root)

    last = [r for r in records if "deduped_from" not in r][-1]
    assert last["hz_para_list"] == [24, 24, 6] and last["epochs"] == 9
    np.testing.assert_allclose(last["stats"]["auc"], seq_stats["auc"],
                               atol=1e-6)

    for fold in range(3):
        sweep_params, _ = load_checkpoint(
            sweep_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        seq_params, _ = load_checkpoint(
            seq_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        leaves_a = [np.asarray(x)
                    for x in jax.tree_util.tree_leaves(sweep_params)]
        leaves_b = [np.asarray(x)
                    for x in jax.tree_util.tree_leaves(seq_params)]
        assert len(leaves_a) == len(leaves_b)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(a, b)

    # the earlier milestone (E=4) of the same shape must equal a standalone
    # E=4 run (prefix property) — checked via its recorded stats
    seq4_root = tmp_path / "seq4"
    make_synthetic_resource(seq4_root, "ADNI", n_hc=48,
                            n_disease={0: 24, 1: 24}, effect=1.0)
    seq4_args = _point_args(4, [24, 24, 6])
    train_supervised.main(seq4_args, project_root=seq4_root)
    test_supervised.main(seq4_args, project_root=seq4_root)
    seq4_stats = group_analysis.main(seq4_args, project_root=seq4_root)
    mid = [r for r in records if r["hz_para_list"] == [24, 24, 6]
           and r["epochs"] == 4 and "deduped_from" not in r][0]
    np.testing.assert_allclose(mid["stats"]["auc"], seq4_stats["auc"],
                               atol=1e-6)

    # deduped lr points carry the computed point's stats verbatim
    for rec in deduped:
        twin = [r for r in records if "deduped_from" not in r
                and r["hz_para_list"] == rec["hz_para_list"]
                and r["epochs"] == rec["epochs"]][0]
        assert rec["stats"] == twin["stats"]
        assert rec["base_learning_rate"] == 9e-9

    # result_baseline blocks: one per computed point (deduped not re-appended)
    blocks = (sweep_root / "result_baseline" /
              "result_multimodal.txt").read_text()
    assert blocks.count("args.hz_para_list") == 4 * len(
        registry.HC_PATIENT_COMBINATIONS["ADNI"])


def test_sweep_mesh_matches_unsharded(tmp_path):
    """--mesh F,D: the sweep engine's per-point fold-parallel programs shard
    over the device mesh; checkpoints match the unsharded engine within
    GSPMD-partitioning fp drift."""
    plain_root = tmp_path / "plain"
    mesh_root = tmp_path / "meshed"
    for root in (plain_root, mesh_root):
        make_synthetic_resource(root, "ADNI", n_hc=48,
                                n_disease={0: 24, 1: 24}, effect=1.0)

    kwargs = dict(n_splits=2, epochs_list=[4], hz_grid="16 6",
                  lr_grid="1e-4:5e-3")
    sweep_supervised.main(_sweep_args(**kwargs), project_root=plain_root)
    sweep_supervised.main(_sweep_args(mesh="2,4", **kwargs),
                          project_root=mesh_root)

    for fold in range(2):
        plain_params, _ = load_checkpoint(
            plain_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        mesh_params, _ = load_checkpoint(
            mesh_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
            plain_params, mesh_params)


def test_cyclic_lr_points_train_separately(tmp_path):
    """With --lr_schedule cyclic the lr axis is real: no dedupe, and
    different pairs give different checkpoints."""
    root = tmp_path / "proj"
    make_synthetic_resource(root, "ADNI", n_hc=36, n_disease={0: 18, 1: 18},
                            effect=1.0)
    records = sweep_supervised.main(
        _sweep_args(lr_schedule="cyclic", epochs_list=[3],
                    hz_grid="16 6", lr_grid="1e-4:5e-3,1e-6:5e-6"),
        project_root=root)
    assert len(records) == 2
    assert all("deduped_from" not in r for r in records)
    # both points appended real result blocks (no dedupe under cyclic)
    blocks = (root / "result_baseline" / "result_multimodal.txt").read_text()
    assert blocks.count("args.hz_para_list") == 2 * len(
        registry.HC_PATIENT_COMBINATIONS["ADNI"])


def test_milestones_reuse_compiled_chunk_bit_identical():
    """Milestones [2, 6] advance 2 then 4 epochs; the 4-epoch delta reuses
    the compiled 2-epoch chunk twice (one program per run) and the result is
    bit-identical to a single 6-epoch scan."""
    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        stack_fold_batches,
        stack_params,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig

    rng = np.random.default_rng(3)
    dims, folds, n = [12, 8], 2, 24
    model = build_model("cVAE_multimodal", dims, [10], 4, 5, len(dims))
    data = [[rng.normal(size=(n, d)).astype(np.float32) for d in dims]
            for _ in range(folds)]
    cov = [[rng.normal(size=(n, 5)).astype(np.float32) for _ in dims]
           for _ in range(folds)]
    batches = stack_fold_batches(data, cov, 16)
    params = stack_params(
        [model.init_params(jax.random.PRNGKey(0))] * folds)
    keys = np.stack([np.asarray(jax.random.PRNGKey(42))] * folds)

    config6 = TrainConfig(epochs=6, batch_size=16, combine="poe")
    oracle = MultiFoldTrainer(model, config6, n)
    oracle_params, oracle_logs = oracle.run(params, batches, keys)
    oracle_host = jax.tree_util.tree_map(np.asarray,
                                         jax.device_get(oracle_params))

    mft = MultiFoldTrainer(model, config6, n)
    outs = list(mft.run_milestones(params, batches, keys, [2, 6]))
    assert [m for m, _, _ in outs] == [2, 6]
    # the 4-epoch advance reused the 2-epoch program: one compiled chunk
    assert list(mft._chunk_cache) == [2]
    final_params = outs[-1][1]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        oracle_host, final_params)
    np.testing.assert_array_equal(
        outs[-1][2]["total"],
        np.asarray(jax.device_get(oracle_logs["total"])))


def test_sweep_ep_mesh_matches_unsharded(tmp_path):
    """--ep_mesh F,M,D: every grid point trains on the packed layout with
    the modality axis GSPMD-sharded (expert-parallel) on top of
    fold-parallelism; checkpoints and AUCs match the plain engine within
    partitioning fp drift (the mesh reorders the fusion partial sums)."""
    import pytest

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device test platform")
    plain_root = tmp_path / "plain"
    ep_root = tmp_path / "ep"
    for root in (plain_root, ep_root):
        make_synthetic_resource(root, "ADNI", n_hc=48,
                                n_disease={0: 24, 1: 24}, effect=1.0)

    # UCA adds the early-fusion concat as a 4th modality -> a 2-way
    # modality axis divides it
    kwargs = dict(n_splits=2, epochs_list=[2, 4], hz_grid="16 6",
                  lr_grid="1e-4:5e-3", procedures=["UCA-PoE"],
                  combine="PoE", in_memory_fusion=True)
    plain_recs = sweep_supervised.main(_sweep_args(**kwargs),
                                       project_root=plain_root)
    ep_recs = sweep_supervised.main(_sweep_args(ep_mesh="2,2,2", **kwargs),
                                    project_root=ep_root)

    assert len(plain_recs) == len(ep_recs) == 2
    for pr, er in zip(plain_recs, ep_recs):
        assert pr["epochs"] == er["epochs"]
        np.testing.assert_allclose(er["stats"]["auc"], pr["stats"]["auc"],
                                   atol=2e-2)
    for fold in range(2):
        plain_params, _ = load_checkpoint(
            plain_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        ep_params, _ = load_checkpoint(
            ep_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
            plain_params, ep_params)


def test_sweep_packed_xla_matches_plain(tmp_path, capsys):
    """--packed_xla: every grid point trains on the packed-modality
    fold-parallel layout (width-grouped for the mixed-width UCA cohort);
    checkpoints and AUCs match the plain engine within float-reorder
    drift."""
    plain_root = tmp_path / "plain"
    pk_root = tmp_path / "pk"
    for root in (plain_root, pk_root):
        make_synthetic_resource(root, "ADNI", n_hc=48,
                                n_disease={0: 24, 1: 24}, effect=1.0)

    kwargs = dict(n_splits=2, epochs_list=[2, 4], hz_grid="16 6",
                  lr_grid="1e-4:5e-3", procedures=["UCA-PoE"],
                  combine="PoE", in_memory_fusion=True)
    plain_recs = sweep_supervised.main(_sweep_args(**kwargs),
                                       project_root=plain_root)
    pk_recs = sweep_supervised.main(_sweep_args(packed_xla=True, **kwargs),
                                    project_root=pk_root)
    assert "packed-modality layout" in capsys.readouterr().out

    assert len(plain_recs) == len(pk_recs) == 2
    for pr, kr in zip(plain_recs, pk_recs):
        assert pr["epochs"] == kr["epochs"]
        np.testing.assert_allclose(kr["stats"]["auc"], pr["stats"]["auc"],
                                   atol=2e-2)
    for fold in range(2):
        plain_params, _ = load_checkpoint(
            plain_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        pk_params, _ = load_checkpoint(
            pk_root / "outputs" / "kfold_analysis" / "supervised_cvae" /
            f"{fold:03d}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
            plain_params, pk_params)

    import pytest

    with pytest.raises(SystemExit, match="mutually exclusive"):
        sweep_supervised.main(
            _sweep_args(packed_xla=True, ep_mesh="2,2,2", **kwargs),
            project_root=pk_root)


def test_sweep_ep_mesh_gates(tmp_path):
    """Indivisible geometries fail loud before any training."""
    import pytest

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-virtual-device test platform")
    make_synthetic_resource(tmp_path, "ADNI", n_hc=30, n_disease={0: 10})
    with pytest.raises(SystemExit, match="mutually exclusive"):
        sweep_supervised.main(
            _sweep_args(n_splits=2, epochs_list=[2], hz_grid="16 6",
                        lr_grid="1e-4:5e-3", mesh="2,4", ep_mesh="2,2,2"),
            project_root=tmp_path)
    # SM-av45 has ONE modality: a 2-way modality axis cannot divide it
    with pytest.raises(SystemExit, match="not divisible"):
        sweep_supervised.main(
            _sweep_args(n_splits=2, epochs_list=[2], hz_grid="16 6",
                        lr_grid="1e-4:5e-3", ep_mesh="2,2,2"),
            project_root=tmp_path)
