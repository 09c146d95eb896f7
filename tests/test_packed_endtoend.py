"""Packed dual-bank endtoend layout (models/grouped_endtoend.py) ≡
EndToEndCVAE: forward/loss/predict, trained trajectories (sequential +
fold-parallel + resumable), and the nmpmcont CLI routing."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models.endtoend import EndToEndCVAE
from multi_modal_normative_modeling_tpu.models.grouped_endtoend import (
    GroupedEndToEnd,
)
from multi_modal_normative_modeling_tpu.train import TrainConfig
from multi_modal_normative_modeling_tpu.train.packed_endtoend import (
    GroupedEndToEndMultiTrainer,
    GroupedEndToEndTrainer,
    endtoend_state_dirname,
    make_endtoend_fold_batches,
)

DIMS = [24, 24, 72]  # mixed widths: two groups, dual banks -> [2M] axis
C = 6


def _pair(hidden=(12, 10), latent=5, clf=(8, 6)):
    base = EndToEndCVAE(DIMS, list(hidden), latent, C, len(DIMS),
                        classifier_layers=list(clf), dropout_rate=0.5)
    grouped = GroupedEndToEnd(DIMS, list(hidden), latent, C, len(DIMS),
                              classifier_layers=list(clf), dropout_rate=0.5)
    params = base.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    return base, grouped, params, grouped.pack_params(params), xes, c


def test_pack_roundtrip():
    _, grouped, params, gpacked, _, _ = _pair()
    restored = grouped.unpack_params(gpacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, params)


@pytest.mark.parametrize("train", [True, False])
def test_forward_and_loss_equivalence(train):
    base, grouped, params, gpacked, xes, c = _pair()
    key = jax.random.PRNGKey(3)
    mask = jnp.asarray(np.r_[np.ones(7), np.zeros(2)].astype(np.float32))
    labels = jnp.asarray(np.array([0, 1, 0, 1, 1, 0, 1, 0, 0]))

    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           train=train, mask=mask)
    loss_ref = base.loss(params, xes, fwd_ref, labels, margin=1.0,
                         weight_contrastive=0.7, mask=mask)
    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, jnp.asarray(c), key,
                          train=train, mask=mask)
    loss = grouped.loss(gpacked, x_groups, fwd, labels, margin=1.0,
                        weight_contrastive=0.7, mask=mask)

    np.testing.assert_allclose(np.asarray(fwd["mu"]),
                               np.asarray(fwd_ref["mu"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fwd["logits"]),
                               np.asarray(fwd_ref["logits"]), rtol=1e-4,
                               atol=1e-5)
    # recon means: group rows split midpoint into health/disease halves
    for gi, (_, idx) in enumerate(grouped.groups):
        gg = len(idx)
        for within, m in enumerate(idx):
            np.testing.assert_allclose(
                np.asarray(fwd["recon_means"][gi][within]),
                np.asarray(fwd_ref["recons_health"][m][0]), rtol=1e-4,
                atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(fwd["recon_means"][gi][gg + within]),
                np.asarray(fwd_ref["recons_disease"][m][0]), rtol=1e-4,
                atol=1e-5)
    # BatchNorm running stats update identically
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        fwd["bn_state"], fwd_ref["bn_state"])
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss key {k}")


def test_predict_equivalence():
    base, grouped, params, gpacked, xes, c = _pair()
    ref = base.predict(params, xes, [jnp.asarray(c)] * len(DIMS))
    got = grouped.predict(gpacked, grouped.pack_inputs(xes),
                          jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def _per_modality_reference(model, config, params, data, cov, labels, key,
                            margin, wc):
    """The exact cli/nmpmcont.py per-modality training path (custom
    loss_fn + BN state_update through FoldTrainer)."""
    from multi_modal_normative_modeling_tpu.train import FoldTrainer

    def loss_fn(p, batch, k):
        lab = batch["extras"]["labels"][:, 0].astype(jnp.int32)
        fwd = model.forward(p, list(batch["x"]), list(batch["c"]), k,
                            train=True, mask=batch["mask"])
        losses = model.loss(p, list(batch["x"]), fwd, lab, margin=margin,
                            weight_contrastive=wc, mask=batch["mask"])
        losses["__bn_state__"] = fwd["bn_state"]
        return losses["total_loss"], losses

    def state_update(p, aux):
        return {**p, "bn_state": aux["__bn_state__"]}

    tr = FoldTrainer(model, config, data[0].shape[0], loss_fn=loss_fn,
                     state_update=state_update)
    return tr.run(params, data, [cov] * len(data), key=key,
                  extras={"labels": labels.astype(np.float32)[:, None]})


def test_trainer_matches_per_modality_trajectory(tmp_path):
    model = EndToEndCVAE(DIMS, [10, 8], 4, C, len(DIMS),
                         classifier_layers=[8, 6], dropout_rate=0.5)
    config = TrainConfig(epochs=8, batch_size=8, combine="poe")
    rng = np.random.default_rng(1)
    n = 19  # ragged final batch exercises the row mask (+ masked BN stats)
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(n, C)).astype(np.float32)
    labels = (rng.random(n) > 0.5).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    p_ref, logs_ref = _per_modality_reference(model, config, params, data,
                                              cov, labels, key, 1.0, 0.7)
    gt = GroupedEndToEndTrainer(model, config, n, 1.0, 0.7)
    p_got, logs_got = gt.run(params, data, cov, labels, key)

    np.testing.assert_allclose(logs_got["total_loss"],
                               logs_ref["total_loss"], rtol=2e-4)
    # atol 5e-4: the PoE fuse + dual-bank reductions reorder float sums in
    # more places than the cvae layouts, and Adam's eps-scale division
    # amplifies the drift on near-zero leaves over the 8 epochs
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
        p_got, p_ref)

    # resumable: bit-identical to the uninterrupted packed run, with the
    # endtoend fingerprint (margin/wcon join the trajectory identity)
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    p_res, _ = gt.run_resumable(params, data, cov, labels, key, tmp_path,
                                checkpoint_every=3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_res, p_got)
    meta = peek_train_meta(tmp_path)
    assert meta["loss"] == "packed_grouped_endtoend"
    assert meta["margin"] == "1.0" and meta["wcon"] == "0.7"


def test_fold_parallel_matches_sequential():
    model = EndToEndCVAE(DIMS, [10, 8], 4, C, len(DIMS),
                         classifier_layers=[8, 6], dropout_rate=0.5)
    config = TrainConfig(epochs=6, batch_size=8, combine="poe")
    rng = np.random.default_rng(2)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32) for d in DIMS]
        cov = rng.normal(size=(16, C)).astype(np.float32)
        labels = (rng.random(16) > 0.5).astype(np.float32)
        folds.append((data, cov, labels))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    gt = GroupedEndToEndTrainer(model, config, 16, 1.0, 1.0)
    seq = [gt.run(params, d, c, lab, k)
           for (d, c, lab), k in zip(folds, keys)]
    mt = GroupedEndToEndMultiTrainer(model, config, 16, 1.0, 1.0)
    par_params, par_logs = mt.run([params] * 2, folds, keys)

    for f in range(2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            par_params[f], seq[f][0])
        np.testing.assert_allclose(par_logs[f]["total_loss"],
                                   seq[f][1]["total_loss"], rtol=1e-5)


def test_cli_packed_routes_and_matches(tmp_path, capsys):
    """nmpmcont --packed_xla trains on the dual-bank layout (announced),
    writes the same checkpoints as the per-modality run to float-reorder
    tolerance, and the resumable state dir uses the endtoend naming."""
    from multi_modal_normative_modeling_tpu.cli import nmpmcont
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        load_checkpoint,
    )

    def _args(**over):
        ns = dict(dataset_resourse="ADHD", hz_para_list=[16, 16, 6],
                  combine="MoE", procedure="SE-MoE", epochs=6, n_splits=2,
                  oversample_percentage=1, model="cVAE_multimodal",
                  single_modality=None, base_learning_rate=0.0001,
                  max_learning_rate=0.005, training_class="nm",
                  learning_rate_classifier=0.001, margin=1.0,
                  weightcontrastive=1.0, weight_kl=1, weight_rec=1,
                  dropout=0.5, layers=[16, 8], fold_parallel=False,
                  packed_xla=False)
        ns.update(over)
        return argparse.Namespace(**ns)

    plain_root = tmp_path / "plain"
    pk_root = tmp_path / "pk"
    for root in (plain_root, pk_root):
        make_synthetic_resource(root, "ADHD", n_hc=40, n_disease={0: 20},
                                seed=3)
    nmpmcont.main(_args(), project_root=plain_root)
    nmpmcont.main(_args(packed_xla=True, fold_parallel=True,
                        checkpoint_every=3),
                  project_root=pk_root)
    out = capsys.readouterr().out
    assert "packed dual-bank endtoend" in out
    model_dir = pk_root / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / endtoend_state_dirname()
            / "train_state.ckpt").exists()
    for fold in range(2):
        pp, _ = load_checkpoint(
            plain_root / "outputs" / "kfold_analysis" / "supervised_cvae"
            / f"{fold:03d}")
        kp, _ = load_checkpoint(
            pk_root / "outputs" / "kfold_analysis" / "supervised_cvae"
            / f"{fold:03d}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
            kp, pp)


def test_batches_carry_labels_extras():
    grouped = GroupedEndToEnd(DIMS, [10, 8], 4, C, len(DIMS))
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(10, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(10, C)).astype(np.float32)
    labels = (rng.random(10) > 0.5).astype(np.float32)
    b = make_endtoend_fold_batches(grouped, data, cov, labels, 4)
    assert b["extras"]["labels"].shape == (3, 4, 1)
    np.testing.assert_array_equal(
        b["extras"]["labels"].reshape(-1)[:10], labels)
    assert b["extras"]["labels"].reshape(-1)[10:].sum() == 0


def test_ep_mesh_composes_with_dual_bank_layout():
    """F,M,D GSPMD fold-parallel training on the packed dual-bank endtoend
    layout: the [2M] decoder axis shards over 'modality' (2M=6 divides 2;
    the [M=3] encoder leaves replicate), classifier/BatchNorm leaves
    replicate explicitly, and the trajectory matches the unmeshed packed
    run to float tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        grouped_e2e_fold_shardings,
        make_ep_mesh3,
    )

    model = EndToEndCVAE(DIMS, [10, 8], 4, C, len(DIMS),
                         classifier_layers=[8, 6], dropout_rate=0.5)
    config = TrainConfig(epochs=4, batch_size=8, combine="poe")
    rng = np.random.default_rng(4)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32) for d in DIMS]
        cov = rng.normal(size=(16, C)).astype(np.float32)
        labels = (rng.random(16) > 0.5).astype(np.float32)
        folds.append((data, cov, labels))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    plain = GroupedEndToEndMultiTrainer(model, config, 16, 1.0, 1.0)
    p_ref, logs_ref = plain.run([params] * 2, folds, keys)

    mesh = make_ep_mesh3(n_fold=2, n_modality=2, n_data=2)
    meshed = GroupedEndToEndMultiTrainer(
        model, config, 16, 1.0, 1.0, mesh=mesh,
        shardings_fn=grouped_e2e_fold_shardings)
    assert meshed.loss_meta["path"].startswith("fold_parallel+ep:")
    p_got, logs_got = meshed.run([params] * 2, folds, keys)

    for f in range(2):
        np.testing.assert_allclose(logs_got[f]["total_loss"],
                                   logs_ref[f]["total_loss"], rtol=5e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
            p_got[f], p_ref[f])

    # resumable meshed run matches too (mesh geometry in the fingerprint)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p_res, _ = meshed.run_resumable([params] * 2, folds, keys,
                                        state_dir=td, checkpoint_every=2)
    for f in range(2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            p_res[f], p_got[f])

    # the dual-bank divisibility gate fails loudly
    with pytest.raises(ValueError, match="dual-bank axis"):
        GroupedEndToEndMultiTrainer(
            EndToEndCVAE([24, 24, 72], [10, 8], 4, C, 3,
                         classifier_layers=[8, 6]),
            config, 16, 1.0, 1.0,
            mesh=make_ep_mesh3(n_fold=2, n_modality=4, n_data=1),
            shardings_fn=grouped_e2e_fold_shardings)


def test_cli_ep_mesh_trains_dual_bank(tmp_path, capsys):
    """nmpmcont --ep_mesh F,M,D: the packed dual-bank program GSPMD-shards
    folds x [2M] dual-bank experts x batch rows (announced, own resumable
    state dir), and its metrics match the unmeshed packed run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.cli import nmpmcont
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    def _args(**over):
        ns = dict(dataset_resourse="ADHD", hz_para_list=[16, 16, 6],
                  combine="MoE", procedure="SE-MoE", epochs=6, n_splits=2,
                  oversample_percentage=1, model="cVAE_multimodal",
                  single_modality=None, base_learning_rate=0.0001,
                  max_learning_rate=0.005, training_class="nm",
                  learning_rate_classifier=0.001, margin=1.0,
                  weightcontrastive=1.0, weight_kl=1, weight_rec=1,
                  dropout=0.5, layers=[16, 8], fold_parallel=False,
                  packed_xla=False, ep_mesh=None)
        ns.update(over)
        return argparse.Namespace(**ns)

    plain_root = tmp_path / "plain"
    ep_root = tmp_path / "ep"
    for root in (plain_root, ep_root):
        make_synthetic_resource(root, "ADHD", n_hc=40, n_disease={0: 20},
                                seed=3)
    m_plain = nmpmcont.main(_args(packed_xla=True, fold_parallel=True),
                            project_root=plain_root)
    m_ep = nmpmcont.main(_args(ep_mesh="2,2,2", checkpoint_every=3),
                         project_root=ep_root)
    out = capsys.readouterr().out
    assert "expert-parallel packed dual-bank endtoend" in out
    assert train_state_exists(ep_root / "outputs" / "kfold_analysis"
                              / "supervised_cvae" / "ep-grouped-e2e-state")
    np.testing.assert_allclose(m_ep["accuracy"], m_plain["accuracy"],
                               atol=0.15)

    # gates fail loud
    with pytest.raises(SystemExit, match="dual-bank axis"):
        nmpmcont.main(_args(ep_mesh="1,8,1"), project_root=ep_root)
