"""GroupedStackedCVAE (pad-free width-grouped layout) ≡ MultimodalCVAE ≡
StackedMultimodalCVAE: forward, loss, gradients, trained trajectories,
resumable fingerprint."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.models.grouped import (
    GroupedStackedCVAE,
    width_groups,
)
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig
from multi_modal_normative_modeling_tpu.train.grouped import (
    GroupedFoldTrainer,
    GroupedMultiFoldTrainer,
)

# the flagship shape class: repeated narrow widths + one wide modality
DIMS = [24, 24, 24, 72]
C = 5


def test_width_groups():
    assert width_groups([90, 90, 90, 270]) == [(90, [0, 1, 2]), (270, [3])]
    assert width_groups([16, 12]) == [(16, [0]), (12, [1])]
    assert width_groups([7, 7]) == [(7, [0, 1])]
    # first-appearance order with interleaved widths
    assert width_groups([270, 90, 270, 90]) == [(270, [0, 2]), (90, [1, 3])]


@pytest.fixture
def trio():
    base = build_model("cVAE_multimodal", DIMS, [12, 12], 6, C, len(DIMS))
    grouped = GroupedStackedCVAE(DIMS, [12, 12], 6, C, len(DIMS))
    params = base.init_params(jax.random.PRNGKey(0))
    gpacked = grouped.pack_params(params)
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    return base, grouped, params, gpacked, xes, c


@pytest.mark.parametrize("combine", ["poe", "gpoe", "moe", "mopoe"])
def test_forward_and_loss_equivalence(trio, combine):
    base, grouped, params, gpacked, xes, c = trio
    key = jax.random.PRNGKey(3)

    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           combine)
    loss_ref = base.loss(params, xes, fwd_ref)

    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, jnp.asarray(c), key, combine)
    loss = grouped.loss(gpacked, x_groups, fwd)

    np.testing.assert_allclose(np.asarray(fwd["mu_multimodal"]),
                               np.asarray(fwd_ref["mu_multimodal"]),
                               rtol=1e-5, atol=1e-6)
    # per-group recon means against the per-modality reference
    for gi, (_, idx) in enumerate(grouped.groups):
        for within, m in enumerate(idx):
            np.testing.assert_allclose(
                np.asarray(fwd["recon_means"][gi][within]),
                np.asarray(fwd_ref["recon_means"][m]), rtol=1e-4,
                atol=1e-5)
    for k in ("total", "kl", "ll"):
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5)


def test_gradient_equivalence(trio):
    base, grouped, params, gpacked, xes, c = trio
    key = jax.random.PRNGKey(3)

    def loss_base(p):
        fwd = base.forward(p, xes, [jnp.asarray(c)] * len(DIMS), key, "gpoe")
        return base.loss(p, xes, fwd)["total"]

    def loss_grouped(p):
        x_groups = grouped.pack_inputs(xes)
        fwd = grouped.forward(p, x_groups, jnp.asarray(c), key, "gpoe")
        return grouped.loss(p, x_groups, fwd)["total"]

    g_ref = jax.grad(loss_base)(params)
    g_unpacked = grouped.unpack_params(jax.grad(loss_grouped)(gpacked))
    for m in range(len(DIMS)):
        np.testing.assert_allclose(
            np.asarray(g_unpacked["enc"][m]["hidden"][0]["w"]),
            np.asarray(g_ref["enc"][m]["hidden"][0]["w"]),
            rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_unpacked["dec"][m]["mean"]["w"]),
            np.asarray(g_ref["dec"][m]["mean"]["w"]),
            rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_unpacked["alpha"]),
                               np.asarray(g_ref["alpha"]),
                               rtol=2e-4, atol=1e-6)


def test_pack_roundtrip(trio):
    _, grouped, params, gpacked, _, _ = trio
    restored = grouped.unpack_params(gpacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, params)


def test_grouped_trainer_matches_per_modality_trajectory(tmp_path):
    model = build_model("cVAE_multimodal", DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=8, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(1)
    n = 19  # ragged final batch exercises the row mask
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(n, C)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    p_ref, logs_ref = FoldTrainer(model, config, n).run(
        params, data, [cov] * len(DIMS), key=key)
    gt = GroupedFoldTrainer(model, config, n)
    p_got, logs_got = gt.run(params, data, cov, key=key)

    np.testing.assert_allclose(logs_got["total"], logs_ref["total"],
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        p_got, p_ref)

    # resumable path rides PackedStateTrainerBase with its own fingerprint
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    p_res, _ = gt.run_resumable(params, data, cov, key, tmp_path,
                                checkpoint_every=4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_res, p_got)
    assert peek_train_meta(tmp_path) == {"loss": "packed_grouped",
                                         "precision": "fp32",
                                         "batch": "8"}


def test_cli_packed_routes_grouped_on_mixed_widths(tmp_path, capsys):
    """--packed_xla rides the width-grouped layout for mixed-width cvae
    cohorts (UCA adds the 270-wide early fusion next to the 90-wide
    blocks) and the padded layout for uniform widths (SE), end-to-end
    through the train CLI with working checkpoints + resumable state."""
    import argparse

    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    def args(procedure, combine, **over):
        base = dict(
            dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
            procedure=procedure, combine=combine, epochs=4, n_splits=2,
            oversample_percentage=1, model="cVAE_multimodal",
            single_modality=None, base_learning_rate=0.0001,
            max_learning_rate=0.005, training_class="nm",
            lr_schedule="constant", packed_xla=True, precision="fp32",
        )
        base.update(over)
        return argparse.Namespace(**base)

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 15},
                            with_early_fusion=True)
    train_supervised.main(args("UCA-gPoE", "gPoE", fold_parallel=True,
                               checkpoint_every=2),
                          project_root=tmp_path)
    out = capsys.readouterr().out
    assert "width-grouped modalities" in out
    model_dir = tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "grouped-state" / "train_state.ckpt").exists()
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()

    train_supervised.main(args("SE-MoE", "MoE"), project_root=tmp_path)
    out = capsys.readouterr().out
    assert "(packed modalities)" in out


def test_grouped_fold_parallel_matches_sequential():
    model = build_model("cVAE_multimodal", DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=6, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(2)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32) for d in DIMS]
        cov = [rng.normal(size=(16, C)).astype(np.float32)] * len(DIMS)
        folds.append((data, cov))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    gt = GroupedFoldTrainer(model, config, 16)
    seq = [gt.run(params, f[0], f[1][0], key=k)
           for f, k in zip(folds, keys)]

    mft = GroupedMultiFoldTrainer(model, config, 16)
    par_params, par_logs = mft.run([params] * 2, folds, keys)

    for f in range(2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            par_params[f], seq[f][0])
        np.testing.assert_allclose(par_logs[f]["total"],
                                   seq[f][1]["total"], rtol=1e-5)


# ---- grouped layout across the cvae-skeleton zoo (round 5) ---------------

@pytest.mark.parametrize("name,combine", [
    ("mmJSD", "poe"), ("mmJSD", "gpoe"),
    ("mvtCAE", "poe"),   # ProductOfExperts2-fed-variances quirk branch
    ("mvtCAE", "gpoe"),
])
def test_variant_forward_and_loss_equivalence(name, combine):
    from multi_modal_normative_modeling_tpu.models.stacked import (
        SKELETON_VARIANTS,
    )

    base = build_model(name, DIMS, [12, 12], 6, C, len(DIMS))
    grouped = GroupedStackedCVAE(DIMS, [12, 12], 6, C, len(DIMS),
                                 variant=SKELETON_VARIANTS[name])
    params = base.init_params(jax.random.PRNGKey(0))
    gpacked = grouped.pack_params(params)
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           combine)
    loss_ref = base.loss(params, xes, fwd_ref)
    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, jnp.asarray(c), key, combine)
    loss = grouped.loss(gpacked, x_groups, fwd)

    np.testing.assert_allclose(np.asarray(fwd["mu_multimodal"]),
                               np.asarray(fwd_ref["mu_multimodal"]),
                               rtol=1e-5, atol=1e-6)
    for gi, (_, idx) in enumerate(grouped.groups):
        for within, m in enumerate(idx):
            np.testing.assert_allclose(
                np.asarray(fwd["recon_means"][gi][within]),
                np.asarray(fwd_ref["recon_means"][m]), rtol=1e-4,
                atol=1e-5)
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss key {k}")


def test_nmmlp_grouped_forward_and_loss_equivalence():
    from multi_modal_normative_modeling_tpu.models.multimodal import (
        MultimodalCVAE,
    )

    base = MultimodalCVAE(DIMS, [12, 12], 6, C, len(DIMS), True,
                          variant="nmmlp")
    grouped = GroupedStackedCVAE(DIMS, [12, 12], 6, C, len(DIMS),
                                 variant="nmmlp")
    params = base.init_params(jax.random.PRNGKey(0))
    gpacked = grouped.pack_params(params)
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           "moe")
    loss_ref = base.loss(params, xes, fwd_ref)
    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, jnp.asarray(c), key, "moe")
    loss = grouped.loss(gpacked, x_groups, fwd)
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_mmjsd_per_modality_jsd_unpermutes_grouped_stats():
    """The mmJSD opt-out (jsd_on_fused=False) computes KL over ORDERED
    stat pairs i<j — the grouped layout must un-permute its grouped-order
    stats back to original modality order or the pair directions flip.
    Use interleaved widths so grouped order != original order."""
    from multi_modal_normative_modeling_tpu.models.multimodal import (
        MultimodalCVAE,
    )

    dims = [30, 12, 30, 12]  # grouped order: [0, 2, 1, 3]
    base = MultimodalCVAE(dims, [10, 10], 5, C, len(dims), True,
                          variant="mmjsd", jsd_on_fused=False)
    grouped = GroupedStackedCVAE(dims, [10, 10], 5, C, len(dims),
                                 variant="mmjsd", jsd_on_fused=False)
    assert grouped.perm != list(range(len(dims)))
    params = base.init_params(jax.random.PRNGKey(0))
    gpacked = grouped.pack_params(params)
    rng = np.random.default_rng(1)
    xes = [rng.normal(size=(8, d)).astype(np.float32) for d in dims]
    c = rng.normal(size=(8, C)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(dims), key,
                           "poe")
    jsd_ref = float(base.loss(params, xes, fwd_ref)["jsd"])
    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, jnp.asarray(c), key, "poe")
    jsd = float(grouped.loss(gpacked, x_groups, fwd)["jsd"])
    assert jsd_ref != 0.0  # the opt-out produces a real regularizer
    np.testing.assert_allclose(jsd, jsd_ref, rtol=2e-5)


@pytest.mark.parametrize("name", ["mmJSD", "mvtCAE"])
def test_variant_grouped_trainer_matches_per_modality(name, tmp_path):
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    model = build_model(name, DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=6, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(1)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(16, C)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    p_ref, logs_ref = FoldTrainer(model, config, 16).run(
        params, data, [cov] * len(DIMS), key=key)
    gt = GroupedFoldTrainer(model, config, 16)
    assert gt.loss_meta["loss"] == f"packed_grouped_{model.variant}"
    p_got, logs_got = gt.run(params, data, cov, key=key)

    np.testing.assert_allclose(logs_got["total"], logs_ref["total"],
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        p_got, p_ref)
    # resumable state carries the variant-suffixed fingerprint
    p_res, _ = gt.run_resumable(params, data, cov, key, tmp_path,
                                checkpoint_every=3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_res, p_got)
    assert peek_train_meta(tmp_path)["loss"] == \
        f"packed_grouped_{model.variant}"


def test_routing_extends_to_skeleton_variants():
    """select_packed_trainer sends mixed-width mmjsd/mvtcae/nmmlp cohorts
    to the grouped layout (round 5) and uniform-width ones to the padded
    layout, exactly like cvae."""
    from multi_modal_normative_modeling_tpu.models.multimodal import (
        MultimodalCVAE,
    )
    from multi_modal_normative_modeling_tpu.train.grouped import (
        select_packed_trainer,
    )

    for name in ("mmJSD", "mvtCAE"):
        mixed = build_model(name, [24, 24, 72], [10], 4, C, 3)
        cls, layout, tag = select_packed_trainer(mixed, False)
        assert tag == "grouped" and layout == "width-grouped"
        assert cls is GroupedFoldTrainer
        uniform = build_model(name, [24, 24, 24], [10], 4, C, 3)
        _, layout, tag = select_packed_trainer(uniform, True)
        assert tag == "padded" and layout == "packed"
    nm = MultimodalCVAE([24, 72], [10], 4, C, 2, True, variant="nmmlp")
    cls, layout, tag = select_packed_trainer(nm, True)
    assert tag == "grouped" and cls is GroupedMultiFoldTrainer


def test_ep_mesh_composes_with_grouped_layout():
    """F,M,D GSPMD fold-parallel training on the GROUPED layout: divisible
    width-group axes shard over 'modality', ragged groups replicate, and
    the trajectory matches the unmeshed grouped run to float tolerance
    (round 5 — EP no longer forces the padded layout's ~3x width tax)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        grouped_fold_shardings,
        make_ep_mesh3,
    )

    dims = [24, 24, 24, 72]  # M=4 divides; groups G=3 and G=1 replicate
    model = build_model("cVAE_multimodal", dims, [10, 8], 4, C, len(dims))
    config = TrainConfig(epochs=4, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(4)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32) for d in dims]
        cov = [rng.normal(size=(16, C)).astype(np.float32)] * len(dims)
        folds.append((data, cov))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    plain = GroupedMultiFoldTrainer(model, config, 16)
    p_ref, logs_ref = plain.run([params] * 2, folds, keys)

    mesh = make_ep_mesh3(n_fold=2, n_modality=2, n_data=2)
    meshed = GroupedMultiFoldTrainer(model, config, 16, mesh=mesh,
                                     shardings_fn=grouped_fold_shardings)
    assert meshed.loss_meta["path"].startswith("fold_parallel+ep:")
    p_got, logs_got = meshed.run([params] * 2, folds, keys)

    for f in range(2):
        np.testing.assert_allclose(logs_got[f]["total"],
                                   logs_ref[f]["total"], rtol=5e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
            p_got[f], p_ref[f])


def test_cli_ep_mesh_rides_grouped_on_mixed_widths(tmp_path, capsys):
    """train CLI --ep_mesh F,M,D on a mixed-width (UCA) cohort announces
    and trains the width-grouped EP form with its own resumable state
    dir."""
    import argparse

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 15},
                            with_early_fusion=True)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="UCA-gPoE", combine="gPoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", precision="fp32", ep_mesh="2,2,2",
        checkpoint_every=2,
    )
    train_supervised.main(args, project_root=tmp_path)
    out = capsys.readouterr().out
    assert "expert-parallel width-grouped modalities" in out
    model_dir = tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "ep-grouped-state" / "train_state.ckpt").exists()
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()
