"""--fused_train_step CLI path: full pipeline on the fused Pallas kernel
(interpret mode on CPU), trajectory parity with the XLA trainer, and the
automatic fallback for out-of-scope configs."""
import argparse

import jax
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import train_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import (
    FoldTrainer,
    TrainConfig,
    load_checkpoint,
)
from multi_modal_normative_modeling_tpu.train.fused import (
    FusedFoldTrainer,
    supported,
)


def _args(**overrides):
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=8, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fused_train_step=True,
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def test_fused_trainer_matches_xla_trajectory():
    """Same PRNG stream, same math -> near-identical params after training."""
    dims = [20, 12]
    model = build_model("cVAE_multimodal", dims, [10, 8], 4, 3, len(dims))
    config = TrainConfig(epochs=12, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(0)
    n = 19  # ragged final batch exercises the row mask
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(n, 3)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    xla = FoldTrainer(model, config, n)
    p_xla, logs_xla = xla.run(params, data, [cov] * len(dims), key=key)

    fused = FusedFoldTrainer(model, config, n, interpret=True)
    p_fused, logs_fused = fused.run(params, data, cov, key=key)

    np.testing.assert_allclose(logs_fused["total"], logs_xla["total"],
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        p_fused, p_xla)


@pytest.mark.parametrize("hidden,latent", [([10], 4), ([12, 10, 8], 4)],
                         ids=["1hidden", "3hidden"])
def test_fused_trainer_other_depths(hidden, latent):
    dims = [16, 12]
    model = build_model("cVAE_multimodal", dims, hidden, latent, 3, len(dims))
    config = TrainConfig(epochs=6, batch_size=8, combine="moe")
    rng = np.random.default_rng(1)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(16, 3)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    xla = FoldTrainer(model, config, 16)
    p_xla, _ = xla.run(params, data, [cov] * len(dims), key=key)
    fused = FusedFoldTrainer(model, config, 16, interpret=True)
    p_fused, _ = fused.run(params, data, cov, key=key)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        p_fused, p_xla)


def test_supported_pre_checks():
    model = build_model("cVAE_multimodal", [20, 12], [10, 8], 4, 3, 2)
    config = TrainConfig(combine="gpoe")
    assert supported(model, config, 256)[0]
    ok, reason = supported(model, config, 256, fold_parallel=True)
    assert not ok and "fold_parallel" in reason
    # round 3: bf16 routes to the TILED kernel (bf16-resident weights/tiles)
    from multi_modal_normative_modeling_tpu.train.fused import select_kernel

    kernel, reason = select_kernel(
        model, TrainConfig(combine="gpoe", precision="bf16"), 256)
    assert kernel == "tiled", reason
    kernel, reason = select_kernel(
        model, TrainConfig(combine="gpoe", precision="fp16"), 256)
    assert kernel is None and "precision" in reason
    dmvae = build_model("DMVAE", [20, 12], [10, 8], 6, 3, 2)
    ok, reason = supported(dmvae, config, 256)
    assert not ok
    # fp32 past the single-block VMEM ceiling routes to XLA (the tiled
    # fp32 kernel is measured slower at every such width — round-4 fix),
    # not to the tiled kernel, whatever the modality count
    wide = build_model("cVAE_multimodal", [3485] * 3, [110, 110], 10, 29, 3)
    kernel, reason = select_kernel(wide, config, 256)
    assert kernel is None and "XLA" in reason
    wide1 = build_model("cVAE_multimodal", [3485], [110, 110], 10, 29, 1)
    kernel, reason = select_kernel(wide1, config, 256)
    assert kernel is None, reason
    # small shapes keep the single-block kernel (fastest at narrow widths)
    assert select_kernel(model, config, 256)[0] == "single"


def test_select_kernel_measured_routing_table():
    """Pins select_kernel to the MEASURED winners of RESULTS.md's round-3
    routing-window table (2000-step programs, batch 256): tiled fp32 loses
    to XLA at 3x768/1024/1536 (117.0/154.8/245.2 vs 111.8/127.0/142.9
    us/step), tiled-bf16 wins window-robustly only at ~768-wide (95.5 vs
    111.8; the 1024 row was window-dependent -> conservative XLA)."""
    from multi_modal_normative_modeling_tpu.train.fused import select_kernel

    def route(width, modalities, precision):
        m = build_model("cVAE_multimodal", [width] * modalities, [110, 110],
                        10, 29, modalities)
        cfg = TrainConfig(combine="gpoe", precision=precision)
        return select_kernel(m, cfg, 256)[0]

    expected = {
        # (width, precision) -> kernel (None = XLA path)
        (90, "fp32"): "single",   # narrow: single-block fits and wins
        (90, "bf16"): "tiled",    # bf16 has no single-block; narrow tiled
        (768, "fp32"): None,      # measured: tiled fp32 117.0 vs XLA 111.8
        (768, "bf16"): "tiled",   # measured: 95.5 vs 111.8 (window-robust)
        (1024, "fp32"): None,     # measured: 154.8 vs 127.0
        (1024, "bf16"): None,     # window-dependent -> conservative XLA
        (1536, "fp32"): None,     # measured: 245.2 vs 142.9
        (1536, "bf16"): None,     # measured: 192.7 vs 142.9
        (3485, "fp32"): None,     # PPMI falsification (861.3 vs 293.4)
        (3485, "bf16"): None,     # PPMI falsification (962.1 vs 293.4)
    }
    got = {k: route(k[0], 3, k[1]) for k in expected}
    assert got == expected


def test_fused_resume_refuses_numerics_mismatch(tmp_path):
    """The fused train state carries a (kernel, precision) fingerprint: a
    state checkpointed under fp32/single must refuse to resume under a
    different kernel or precision instead of silently continuing a hybrid
    trajectory (round-3 advisor finding)."""
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    dims = [16, 12]
    model = build_model("cVAE_multimodal", dims, [10, 8], 4, 3, len(dims))
    config = TrainConfig(epochs=4, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(5)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(16, 3)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    fused = FusedFoldTrainer(model, config, 16, interpret=True)
    assert fused.loss_meta == {"loss": "fused_kernel_single",
                               "precision": "fp32", "batch": "8"}
    fused.run_resumable(params, data, cov, key, tmp_path,
                        checkpoint_every=2)
    assert peek_train_meta(tmp_path) == fused.loss_meta

    # same config resumes clean
    FusedFoldTrainer(model, config, 16, interpret=True).run_resumable(
        params, data, cov, key, tmp_path, checkpoint_every=2, resume=True)

    # a different kernel (tiled fp32, forced) is a different trajectory
    tiled = FusedFoldTrainer(model, config, 16, interpret=True,
                             kernel="tiled")
    with pytest.raises(ValueError, match="refusing to resume"):
        tiled.run_resumable(params, data, cov, key, tmp_path,
                            checkpoint_every=2, resume=True)

    # the advisor's exact scenario: fp32 state resumed under bf16
    bf_cfg = TrainConfig(epochs=6, batch_size=8, combine="gpoe",
                         precision="bf16")
    bf = FusedFoldTrainer(model, bf_cfg, 16, interpret=True)
    assert bf.loss_meta["precision"] == "bf16"
    with pytest.raises(ValueError, match="refusing to resume"):
        bf.run_resumable(params, data, cov, key, tmp_path,
                         checkpoint_every=2, resume=True)


def test_packed_resume_states_are_fingerprinted(tmp_path):
    """Packed (and fold-parallel packed) train states carry the resume
    fingerprint too — previously untagged, bypassing the guard."""
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedFoldTrainer,
        PackedMultiFoldTrainer,
    )

    dims = [16, 12]
    model = build_model("cVAE_multimodal", dims, [10, 8], 4, 3, len(dims))
    config = TrainConfig(epochs=4, batch_size=8, combine="gpoe")
    rng = np.random.default_rng(6)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(16, 3)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(11)

    ptr = PackedFoldTrainer(model, config, 16)
    ptr.run_resumable(params, data, cov, key, tmp_path / "seq",
                      checkpoint_every=2)
    assert peek_train_meta(tmp_path / "seq") == {
        "loss": "packed_stacked", "precision": "fp32", "batch": "8"}

    pmft = PackedMultiFoldTrainer(model, config, 16)
    folds = [(data, [cov] * len(dims))] * 2
    pmft.run_resumable([params] * 2, folds, [key] * 2, tmp_path / "par",
                       checkpoint_every=2)
    assert peek_train_meta(tmp_path / "par") == {
        "loss": "packed_stacked", "precision": "fp32",
        "path": "fold_parallel", "batch": "8"}


def test_cli_fused_pipeline(tmp_path, capsys):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 15, 1: 15},
                            effect=0.8)
    train_supervised.main(_args(), project_root=root)
    out = capsys.readouterr().out
    assert "fused Pallas train-step kernel" in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    for fold in range(2):
        # raw msgpack restore represents list nodes as str-indexed dicts
        params, config = load_checkpoint(model_dir / f"{fold:03d}")
        assert config["model"] == "cVAE_multimodal"
        w = np.asarray(params["enc"]["0"]["hidden"]["0"]["w"])
        assert np.isfinite(w).all()


def test_cli_fused_fallback_message(tmp_path, capsys):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    args = _args(model="DMVAE", epochs=4)
    train_supervised.main(args, project_root=root)
    out = capsys.readouterr().out
    assert "fused train step unavailable" in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()


def test_cli_fused_with_checkpoint_every(tmp_path, capsys):
    """--fused_train_step + --checkpoint_every train on the fused path
    (formerly an XLA fallback) and leave a fused-specific resumable state
    dir alongside the standard per-fold checkpoints."""
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 15, 1: 15},
                            effect=0.8)
    train_supervised.main(_args(checkpoint_every=4), project_root=root)
    out = capsys.readouterr().out
    assert "fused Pallas train-step kernel" in out
    assert "fused train step unavailable" not in out
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    for fold in range(2):
        params, config = load_checkpoint(model_dir / f"{fold:03d}")
        assert np.isfinite(
            np.asarray(params["enc"]["0"]["hidden"]["0"]["w"])).all()
        assert train_state_exists(model_dir / f"{fold:03d}-fused-state")
