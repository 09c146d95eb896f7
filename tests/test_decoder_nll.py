"""Fused decoder-head + Gaussian-NLL op (kernels/decoder_nll.py): value and
gradient parity vs the plain XLA loss (autodiff), incl. masked rows and
multi-tile batches."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.kernels.decoder_nll import (
    decoder_nll,
    fused_decoder_loss_fn,
)
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.ops.losses import gaussian_ll
from multi_modal_normative_modeling_tpu.train import TrainConfig
from multi_modal_normative_modeling_tpu.train.trainer import (
    default_loss_fn,
    make_batches,
)


def test_decoder_nll_value_and_grads_match_autodiff():
    rng = np.random.default_rng(0)
    B, H, D = 20, 11, 37
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    lvo = jnp.full((1, D), -3.0, jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    mask = jnp.asarray(np.r_[np.ones(B - 3), np.zeros(3)].astype(np.float32))
    n = jnp.maximum(jnp.sum(mask), 1.0)

    def plain(g, w, b, lvo):
        return gaussian_ll(x, g @ w + b, lvo, mask)

    def fused(g, w, b, lvo):
        return decoder_nll(g, w, b, lvo, x, mask, n, tile_b=8)

    ref_val, ref_grads = jax.value_and_grad(plain, argnums=(0, 1, 2, 3))(
        g, w, b, lvo)
    got_val, got_grads = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(
        g, w, b, lvo)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)
    for got, ref in zip(got_grads, ref_grads):
        ref = np.asarray(ref).reshape(np.asarray(got).shape)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=1e-4, atol=1e-6)


def test_decoder_nll_grads_at_ppmi_width():
    """Parity AT the target width (H=110, D=3485): pins the wide-regime
    lane padding (3485->3584) and the multi-tile recompute backward."""
    rng = np.random.default_rng(5)
    B, H, D = 16, 110, 3485
    g = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)
    lvo = jnp.full((1, D), -3.0, jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    mask = jnp.asarray(np.r_[np.ones(B - 2), np.zeros(2)].astype(np.float32))
    n = jnp.maximum(jnp.sum(mask), 1.0)

    def plain(g, w, b, lvo):
        return gaussian_ll(x, g @ w + b, lvo, mask)

    def fused(g, w, b, lvo):
        return decoder_nll(g, w, b, lvo, x, mask, n, tile_b=8)

    ref_val, ref_grads = jax.value_and_grad(plain, argnums=(0, 1, 2, 3))(
        g, w, b, lvo)
    got_val, got_grads = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(
        g, w, b, lvo)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)
    for got, ref in zip(got_grads, ref_grads):
        ref = np.asarray(ref).reshape(np.asarray(got).shape)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("combine", ["gpoe", "moe"])
def test_fused_decoder_loss_matches_default(combine):
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

    config = TrainConfig(epochs=1, batch_size=16, combine=combine)
    plain_fn = default_loss_fn(model, config)
    fused_fn = fused_decoder_loss_fn(model, config)

    (ref_total, ref_aux), ref_grads = jax.value_and_grad(
        plain_fn, has_aux=True)(params, batch, key)
    (got_total, got_aux), got_grads = jax.value_and_grad(
        fused_fn, has_aux=True)(params, batch, key)

    np.testing.assert_allclose(float(got_total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(got_aux["ll"]), float(ref_aux["ll"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        got_grads, ref_grads)


def test_fused_decoder_training_trajectory_matches_plain():
    """A few optimizer steps through FoldTrainer with the fused loss stay
    float-close to the plain path (same PRNG stream, same optimizer)."""
    from multi_modal_normative_modeling_tpu.train import FoldTrainer

    dims = [24, 16]
    model = build_model("cVAE_multimodal", dims, [12, 12], 6, 5, len(dims))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    data = [rng.normal(size=(40, d)).astype(np.float32) for d in dims]
    cov = [rng.normal(size=(40, 5)).astype(np.float32)] * len(dims)
    config = TrainConfig(epochs=4, batch_size=16, combine="gpoe")

    plain = FoldTrainer(model, config, 40)
    fused = FoldTrainer(model, config, 40,
                        loss_fn=fused_decoder_loss_fn(model, config))
    p1, logs1 = plain.run(params, data, cov)
    p2, logs2 = fused.run(params, data, cov)
    np.testing.assert_allclose(logs2["total"], logs1["total"], rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5),
        p2, p1)


def test_fused_decoder_cli_pipeline(tmp_path):
    """--fused_decoder through the train CLI (sequential and fold-parallel)
    produces working checkpoints whose test stage runs clean."""
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
        procedure="SE-MoE", combine="MoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=True, precision="fp32",
        fused_decoder=True,
    )
    train_supervised.main(args, project_root=tmp_path)
    model_dir = tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "000" / "cVAE_model.ckpt").exists()
    args.fold_parallel = False
    test_supervised.main(args, project_root=tmp_path)
    dev = (tmp_path / "deviation" / "supervised_cvae" / "ADNI" / "SE-MoE"
           / "path_model" / "av45" / "reconstruction_error_av45.csv")
    assert dev.exists()
