"""Packed layout across the cvae-skeleton zoo (round 4): mmJSD and mvtCAE
share the cvae encoder/decoder MLPs (reference cVAE.py:1354/:1754), so
--packed_xla / the 3-axis --ep_mesh / EP inference now accept them; the
hand-scheduled 2-axis EP trainer stays cvae-only as a tested contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.models.stacked import (
    SKELETON_VARIANTS,
    StackedMultimodalCVAE,
)
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig
from multi_modal_normative_modeling_tpu.train.packed import (
    PackedFoldTrainer,
    PackedMultiFoldTrainer,
    packed_supported,
)

DIMS = [24, 40, 16]
C = 5


def _pair(name):
    base = build_model(name, DIMS, [12, 12], 6, C, len(DIMS))
    stacked = StackedMultimodalCVAE(DIMS, [12, 12], 6, C, len(DIMS),
                                    variant=SKELETON_VARIANTS[name])
    params = base.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    return base, stacked, params, stacked.pack_params(params), xes, c


@pytest.mark.parametrize("name,combine", [
    ("mmJSD", "poe"), ("mmJSD", "gpoe"),
    ("mvtCAE", "poe"),   # ProductOfExperts2-fed-variances quirk branch
    ("mvtCAE", "gpoe"),
])
def test_variant_forward_and_loss_equivalence(name, combine):
    base, stacked, params, packed, xes, c = _pair(name)
    key = jax.random.PRNGKey(3)

    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           combine)
    loss_ref = base.loss(params, xes, fwd_ref)

    x_packed = jnp.asarray(stacked.pack_inputs(xes))
    fwd = stacked.forward(packed, x_packed, jnp.asarray(c), key, combine)
    loss = stacked.loss(packed, x_packed, fwd)

    np.testing.assert_allclose(np.asarray(fwd["mu_multimodal"]),
                               np.asarray(fwd_ref["mu_multimodal"]),
                               rtol=1e-5, atol=1e-6)
    for m in range(len(DIMS)):
        np.testing.assert_allclose(
            np.asarray(fwd["recon_means"][m][:, : DIMS[m]]),
            np.asarray(fwd_ref["recon_means"][m]), rtol=1e-4, atol=1e-5)
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss key {k}")


@pytest.mark.parametrize("name", ["mmJSD", "mvtCAE"])
def test_variant_packed_trainer_matches_per_modality(name):
    model = build_model(name, [16, 12], [10, 8], 8, 3, 2)
    config = TrainConfig(epochs=6, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(1)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in (16, 12)]
    cov = rng.normal(size=(16, 3)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    ok, reason = packed_supported(model, config)
    assert ok, reason
    p_ref, logs_ref = FoldTrainer(model, config, 16).run(
        params, data, [cov, cov], key=key)
    pt = PackedFoldTrainer(model, config, 16)
    assert pt.loss_meta["loss"] == f"packed_stacked_{model.variant}"
    p_got, logs_got = pt.run(params, data, cov, key=key)

    np.testing.assert_allclose(logs_got["total"], logs_ref["total"],
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        p_got, p_ref)


def test_nmmlp_stacked_parity_and_cli_packed(tmp_path, capsys):
    """The nm-MLP variant (cvae skeleton, -MSE ll, no single-modality
    shortcut) packs too: stacked forward/loss parity, and the nmmlp CLI's
    --packed_xla trains checkpoints matching the per-modality run."""
    from multi_modal_normative_modeling_tpu.models.multimodal import (
        MultimodalCVAE,
    )

    dims = [24, 16]
    base = MultimodalCVAE(dims, [12, 10], 6, 5, len(dims), True,
                          variant="nmmlp")
    stacked = StackedMultimodalCVAE(dims, [12, 10], 6, 5, len(dims),
                                    variant="nmmlp")
    params = base.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in dims]
    c = rng.normal(size=(9, 5)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * 2, key, "moe")
    loss_ref = base.loss(params, xes, fwd_ref)
    packed = stacked.pack_params(params)
    x_p = jnp.asarray(stacked.pack_inputs(xes))
    fwd = stacked.forward(packed, x_p, jnp.asarray(c), key, "moe")
    loss = stacked.loss(packed, x_p, fwd)
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)

    # CLI: nmmlp train --packed_xla vs plain, same project layout
    import argparse

    from multi_modal_normative_modeling_tpu.cli import nmmlp
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        load_checkpoint,
    )

    def _args(**over):
        ns = dict(dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
                  procedure="SE-MoE", combine="MoE", epochs=6, n_splits=2,
                  oversample_percentage=1, fold_parallel=False, mesh=None,
                  checkpoint_every=0, resume=False, packed_xla=False)
        ns.update(over)
        return argparse.Namespace(**ns)

    plain_root = tmp_path / "plain"
    pk_root = tmp_path / "pk"
    for root in (plain_root, pk_root):
        make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 15},
                                seed=3)
    nmmlp.train(_args(), project_root=plain_root)
    nmmlp.train(_args(packed_xla=True, fold_parallel=True),
                project_root=pk_root)
    out = capsys.readouterr().out
    assert "packed modalities" in out
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


def test_run_folds_packed_falls_back_loudly(capsys):
    """run_folds(packed=True) with an unsupported config (custom loss)
    prints the reason and trains on the per-modality layout."""
    from multi_modal_normative_modeling_tpu.cli.common import run_folds
    from multi_modal_normative_modeling_tpu.train import TrainConfig

    model = build_model("cVAE_multimodal", [12, 8], [8], 4, 3, 2)
    config = TrainConfig(epochs=2, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in (12, 8)]
    cov = [rng.normal(size=(16, 3)).astype(np.float32)] * 2
    params = model.init_params(jax.random.PRNGKey(0))

    def custom_loss(p, batch, k):
        fwd = model.forward(p, list(batch["x"]), list(batch["c"]), k,
                            "gpoe")
        losses = model.loss(p, list(batch["x"]), fwd, batch["mask"])
        return losses["total"], losses

    out_params, _ = run_folds(model, config, [(data, cov)], [params],
                              [jax.random.PRNGKey(1)], False,
                              loss_fn=custom_loss, packed=True)
    assert "custom loss" in capsys.readouterr().out
    assert len(out_params) == 1


def test_dmvae_packs_on_its_own_layout():
    """Round 5: the DMVAE family passes packed_supported and routes to the
    split-latent grouped trainers (its own state dirname); bf16 stays
    cvae-only."""
    from multi_modal_normative_modeling_tpu.train.grouped import (
        packed_state_dirname,
        select_packed_trainer,
    )
    from multi_modal_normative_modeling_tpu.train.grouped_dmvae import (
        GroupedDMVAEFoldTrainer,
        GroupedDMVAEMultiFoldTrainer,
    )

    dm = build_model("DMVAE", [16, 12], [10, 8], 8, 3, 2)
    ok, reason = packed_supported(dm, TrainConfig(combine="gpoe"))
    assert ok, reason
    ok, reason = packed_supported(
        dm, TrainConfig(combine="gpoe", precision="bf16"))
    assert not ok and "cvae-only" in reason
    cls, layout, tag = select_packed_trainer(dm, False)
    assert cls is GroupedDMVAEFoldTrainer and tag == "dmvae"
    assert layout == "split-latent grouped"
    cls, _, tag = select_packed_trainer(dm, True)
    assert cls is GroupedDMVAEMultiFoldTrainer
    assert packed_state_dirname(tag) == "grouped-dmvae-state"
    assert packed_state_dirname(tag, 2) == "002-grouped-dmvae-state"


def test_two_axis_ep_trainer_refuses_non_cvae():
    """The hand-scheduled (M,D) EP trainer is a cvae-only contract with an
    actionable reason pointing at --packed_xla / F,M,D."""
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        EPFoldTrainer,
        make_ep_mesh,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    mesh = make_ep_mesh(n_modality=2, n_data=2,
                        devices=jax.devices()[:4])
    model = build_model("mmJSD", [16, 12], [10, 8], 8, 3, 2)
    with pytest.raises(ValueError, match="F,M,D"):
        EPFoldTrainer(model, TrainConfig(epochs=2, batch_size=8,
                                         combine="gpoe"), 16, mesh)


def test_three_axis_gspmd_ep_accepts_mmjsd():
    """F,M,D GSPMD fold-parallel packed training runs mmJSD (the compiler
    places the variant's fusion/JSD collectives) and matches the unmeshed
    packed run to float tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        make_ep_mesh3,
        packed_fold_shardings,
    )

    model = build_model("mmJSD", [16, 12], [10, 8], 8, 3, 2)
    config = TrainConfig(epochs=4, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(4)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32)
                for d in (16, 12)]
        cov = [rng.normal(size=(16, 3)).astype(np.float32)] * 2
        folds.append((data, cov))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    plain = PackedMultiFoldTrainer(model, config, 16)
    p_ref, logs_ref = plain.run([params] * 2, folds, keys)

    mesh = make_ep_mesh3(n_fold=2, n_modality=2, n_data=2)
    meshed = PackedMultiFoldTrainer(model, config, 16, mesh=mesh,
                                    shardings_fn=packed_fold_shardings)
    assert meshed.loss_meta["loss"] == "packed_stacked_mmjsd"
    p_got, logs_got = meshed.run([params] * 2, folds, keys)

    for f in range(2):
        np.testing.assert_allclose(logs_got[f]["total"],
                                   logs_ref[f]["total"], rtol=5e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
            p_got[f], p_ref[f])


def test_ep_inference_accepts_skeleton_refuses_dmvae():
    from multi_modal_normative_modeling_tpu.cli.test_supervised import (
        _ep_infer_program,
    )
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        make_ep_mesh3,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    mesh = make_ep_mesh3(n_fold=2, n_modality=2, n_data=2)
    config = {"model": "mmJSD", "input_dim_list": [16, 12],
              "hidden_dim": [10, 8], "latent_dim": 8, "c_dim": 3,
              "modalities": 2, "non_linear": True}
    stacked, vinfer = _ep_infer_program(config, "gpoe", mesh)
    assert stacked.variant == "mmjsd"
    # mixed widths: round 5 routes EP inference onto the pad-free
    # width-grouped layout (tuple-per-group operands)
    from multi_modal_normative_modeling_tpu.models.grouped import (
        GroupedStackedCVAE,
    )

    assert isinstance(stacked, GroupedStackedCVAE)

    base = build_model("mmJSD", [16, 12], [10, 8], 8, 3, 2)
    params = base.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    rows = 8
    xes = [rng.normal(size=(rows, d)).astype(np.float32) for d in (16, 12)]
    c = rng.normal(size=(rows, 3)).astype(np.float32)
    from multi_modal_normative_modeling_tpu.parallel.folds import (
        stack_params,
    )

    sp = stack_params([stacked.pack_params(params)] * 2)
    per_fold = stacked.pack_inputs(xes)
    x_p = tuple(np.stack([g] * 2) for g in per_fold)
    cs = np.stack([c] * 2)
    seeds = np.array([1000, 1001], dtype=np.uint32)
    recons, devs = vinfer(sp, x_p, cs, seeds)
    # fold 0 must match the per-modality model's recon (same PRNG stream)
    ref = base.pred_recon(params, xes, [jnp.asarray(c)] * 2,
                          jax.random.PRNGKey(1000), "gpoe")
    for gi, (_, idx) in enumerate(stacked.groups):
        for within, m in enumerate(idx):
            np.testing.assert_allclose(
                np.asarray(recons[gi])[0, within],
                np.asarray(ref[m]), rtol=2e-4, atol=1e-5)

    bad = dict(config, model="DMVAE")
    with pytest.raises(SystemExit, match="skeleton"):
        _ep_infer_program(bad, "gpoe", mesh)
