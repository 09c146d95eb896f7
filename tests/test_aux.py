"""Aux subsystems: bf16 precision, focal loss, discriminator, profiling
harness, viz, run log."""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import torch

from multi_modal_normative_modeling_tpu import viz
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.models.cvae import (
    apply_discriminator,
    init_discriminator,
)
from multi_modal_normative_modeling_tpu.ops.losses import focal_loss
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig
from multi_modal_normative_modeling_tpu.utils.logging import RunLog
from multi_modal_normative_modeling_tpu.utils.profiling import Timer, annotate


def test_bf16_training_runs_and_tracks_fp32():
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", [24, 30], [16, 16], 6, 5, 2)
    data = [rng.normal(size=(40, d)).astype(np.float32) for d in (24, 30)]
    cov = [rng.normal(size=(40, 5)).astype(np.float32)] * 2
    params = model.init_params(jax.random.PRNGKey(0))

    results = {}
    for precision in ("fp32", "bf16"):
        config = TrainConfig(epochs=10, batch_size=16, combine="poe",
                             precision=precision)
        trainer = FoldTrainer(model, config, 40)
        out, logs = trainer.run(params, data, cov, key=jax.random.PRNGKey(1))
        # master params stay fp32 under bf16 compute
        assert all(leaf.dtype == jnp.float32
                   for leaf in jax.tree_util.tree_leaves(out))
        results[precision] = np.asarray(logs["total"])
    assert np.isfinite(results["bf16"]).all()
    # bf16 loss curve tracks the fp32 one to half-precision tolerance
    np.testing.assert_allclose(results["bf16"], results["fp32"], rtol=0.05)


def test_focal_loss_matches_torch_reference():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=12).astype(np.float32)
    for first in (0.0, 1.0):
        targets = rng.integers(0, 2, size=12).astype(np.float32)
        targets[0] = first
        ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                alpha_focal=0.7, gamma_focal=2.0))
        # reference formula (cVAE.py:121-134)
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets), reduction="none")
        pt = torch.exp(-bce)
        if first == 0:
            ref = (0.7 * (1 - pt) ** 2.0 * bce).mean().item()
        else:
            ref = ((1 - 0.7) * pt ** 2.0 * bce).mean().item()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_discriminator_shapes():
    params = init_discriminator(jax.random.PRNGKey(0), [16, 16, 4])
    z = jnp.ones((9, 4))
    out = apply_discriminator(params, z, non_linear=True)
    assert out.shape == (9, 1)


def test_timer_harness():
    timer = Timer(warmup=1, repeats=3)
    f = jax.jit(lambda x: x * 2 + 1)
    stats = timer.measure(f, jnp.ones((8, 8)))
    assert stats["min_s"] > 0
    assert len(stats["times_s"]) == 3
    with annotate("region"):
        pass


def test_run_log(tmp_path):
    log = RunLog(tmp_path / "run.jsonl")
    log.event("train_start", fold=0, epochs=10)
    log.event("train_end", fold=0, loss=1.5)
    lines = (tmp_path / "run.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    import json

    first = json.loads(lines[0])
    assert first["event"] == "train_start" and first["fold"] == 0


def test_viz_roi_table_and_map(tmp_path):
    rng = np.random.default_rng(0)
    n, d = 40, 6
    cols = [f"ROI_{i}" for i in range(d)]
    frame = pd.DataFrame(rng.random((n, d)) * 0.1, columns=cols)
    frame.insert(0, "participant_id", [f"s{i}" for i in range(n)])
    frame.insert(1, "DIA", [2] * 20 + [0] * 20)
    frame.insert(2, "AGE", 70)
    frame.insert(3, "PTGENDER", 1)
    # inflate patient deviation in ROI_3
    frame.loc[frame["DIA"] == 0, "ROI_3"] += 1.0
    path = tmp_path / "reconstruction_error_roi_mod.csv"
    frame.to_csv(path, index=False)

    table = viz.roi_deviation_table(path, hc_label=2, top_k=3)
    assert table.iloc[0]["roi"] == "ROI_3"
    viz.roi_deviation_map(path, 2, tmp_path / "map.png", top_k=3)
    assert (tmp_path / "map.png").exists()


def test_viz_tsne(tmp_path):
    rng = np.random.default_rng(0)
    latents = np.concatenate([rng.normal(size=(20, 5)),
                              rng.normal(size=(20, 5)) + 3])
    labels = np.array([0] * 20 + [1] * 20)
    emb = viz.tsne_latents(latents, labels, tmp_path / "tsne.png",
                           perplexity=10)
    assert emb.shape == (40, 2)
    assert (tmp_path / "tsne.png").exists()


def test_viz_auc_summary(tmp_path):
    np.savetxt(tmp_path / "cvae_auc_and_std.csv",
               np.array([0.7, 0.8, 0.9, 0.08]), delimiter=",")
    table = viz.auc_summary_table([tmp_path], tmp_path / "summary.csv")
    assert len(table) == 1
    np.testing.assert_allclose(table.iloc[0]["mean_auc"], 0.8)
    assert (tmp_path / "summary.csv").exists()


def test_warm_device_session_overlaps_and_logs(caplog):
    """warm_device_session fires exactly one background attach thread per
    process and logs the measured attach time on 'mmnm.device'."""
    import logging

    from multi_modal_normative_modeling_tpu.utils import jaxconfig

    jaxconfig._warm_thread = None  # fresh-process behavior inside the suite
    with caplog.at_level(logging.INFO, logger="mmnm.device"):
        jaxconfig.warm_device_session()
        thread = jaxconfig._warm_thread
        assert thread is not None
        jaxconfig.warm_device_session()  # idempotent: same thread
        assert jaxconfig._warm_thread is thread
        thread.join(timeout=120)
        assert not thread.is_alive()
    # on the CPU test backend there is no remote session; on a real device
    # backend the measured attach time is logged
    assert any("device session attached" in rec.getMessage()
               or "no remote session" in rec.getMessage()
               for rec in caplog.records)
