"""Pallas kernel parity vs the jnp reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.kernels import (
    fused_decoder_mean,
    fused_encoder,
    fused_pred_deviation,
)
from multi_modal_normative_modeling_tpu.models.cvae import (
    apply_decoder,
    apply_encoder,
    init_decoder,
    init_encoder,
    reparameterize,
)
from multi_modal_normative_modeling_tpu.models import build_model


@pytest.mark.parametrize("b,d,c_dim", [(7, 90, 29), (300, 270, 29), (16, 3485, 2)])
def test_fused_encoder_matches_reference(b, d, c_dim):
    key = jax.random.PRNGKey(0)
    params = init_encoder(key, d, [110, 110], 10, c_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d))
    c = jax.random.normal(jax.random.PRNGKey(2), (b, c_dim))

    mu_ref, lv_ref = apply_encoder(params, x, c, non_linear=True)
    mu_k, lv_k = fused_encoder(params, x, c, non_linear=True, interpret=True)
    np.testing.assert_allclose(np.asarray(mu_k), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_k), np.asarray(lv_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_decoder_matches_reference():
    key = jax.random.PRNGKey(0)
    params = init_decoder(key, 90, [110, 110], 10, 29)
    z = jax.random.normal(jax.random.PRNGKey(1), (33, 10))
    c = jax.random.normal(jax.random.PRNGKey(2), (33, 29))

    mean_ref, _ = apply_decoder(params, z, c, non_linear=True)
    mean_k = fused_decoder_mean(params, z, c, non_linear=True, interpret=True)
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_pred_deviation_matches_reference():
    key = jax.random.PRNGKey(0)
    params = init_decoder(key, 116, [64, 64], 8, 29)
    z = jax.random.normal(jax.random.PRNGKey(1), (21, 8))
    c = jax.random.normal(jax.random.PRNGKey(2), (21, 29))
    x = jax.random.normal(jax.random.PRNGKey(3), (21, 116))

    mean_ref, _ = apply_decoder(params, z, c, non_linear=True)
    dev_ref = np.sum((np.asarray(x) - np.asarray(mean_ref)) ** 2, axis=1) / 116

    recon, dev = fused_pred_deviation(params, z, c, x, non_linear=True,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev), dev_ref, rtol=1e-5, atol=1e-5)


def test_model_fused_inference_matches_pred_recon():
    dims = [40, 60]
    model = build_model("cVAE_multimodal", dims, [32, 32], 8, 5, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    xes = [jax.random.normal(jax.random.PRNGKey(i + 1), (19, d))
           for i, d in enumerate(dims)]
    cs = [jax.random.normal(jax.random.PRNGKey(9), (19, 5))] * 2
    key = jax.random.PRNGKey(7)

    ref = model.pred_recon(params, xes, cs, key, "gpoe")
    dev_ref = [np.asarray(model.reconstruction_deviation(xes[i], ref[i]))
               for i in range(2)]
    recons, devs = model.pred_recon_fused(params, xes, cs, key, "gpoe",
                                          interpret=True)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(recons[i]), np.asarray(ref[i]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(devs[i]), dev_ref[i],
                                   rtol=2e-4, atol=2e-5)


def test_fused_inference_cli_flag(tmp_path):
    """--fused_inference emits the same CSV set with near-identical values."""
    import argparse

    import pandas as pd

    from multi_modal_normative_modeling_tpu.cli import (
        test_supervised,
        train_supervised,
    )
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 20},
                            effect=1.0)
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=10, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(argparse.Namespace(**base), project_root=tmp_path)
    test_supervised.main(argparse.Namespace(**base, fused_inference=False),
                         project_root=tmp_path)
    dev_dir = (tmp_path / "deviation" / "supervised_cvae" / "ADNI" /
               "SM-av45" / "path_model" / "av45")
    ref = pd.read_csv(dev_dir / "reconstruction_error_av45.csv")

    test_supervised.main(argparse.Namespace(**base, fused_inference=True),
                         project_root=tmp_path)
    fused = pd.read_csv(dev_dir / "reconstruction_error_av45.csv")
    np.testing.assert_allclose(fused["Reconstruction error"],
                               ref["Reconstruction error"],
                               rtol=1e-3, atol=1e-4)
