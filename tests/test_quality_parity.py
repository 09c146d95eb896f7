"""Method-quality parity: our jitted trainer vs a reference-equivalent torch
implementation on IDENTICAL data must produce equivalent deviation AUCs.

This is the strongest available stand-in for the BASELINE.json AUC-parity
target (the reference's cohorts are not distributable): both sides train the
same architecture (Encoder/Decoder with learnable output logvar, PoE fusion,
Adam(1e-4), batch 256, no shuffle) on the same scaled matrices, score the
same held-out subjects, and the resulting ROC-AUCs must agree within the
stochastic-seed tolerance.
"""
import numpy as np
import pytest
import torch

import jax

from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.evaluation.metrics import (
    classification_performance,
)
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig

HIDDEN, LATENT, C_DIM = [32, 32], 8, 29
EPOCHS, BATCH = 120, 256


def _prepare(tmp_path):
    from sklearn.preprocessing import RobustScaler
    import pandas as pd

    from multi_modal_normative_modeling_tpu.data.preprocess import (
        one_hot_covariates,
    )

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=160, n_disease={0: 80},
                            effect=0.9, seed=3)
    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    av45 = pd.read_csv(root / "data" / "ADNI" / "av45.csv").merge(y, on="IID")
    hc = av45[av45["DIA"] == 2]
    train_df = hc.iloc[: 120]
    test_df = pd.concat([hc.iloc[120:], av45[av45["DIA"] == 0]])

    cols = [c for c in av45.columns if c not in ("IID", "DIA", "AGE",
                                                 "PTGENDER")]
    scaler = RobustScaler()
    x_train = scaler.fit_transform(train_df[cols].values).astype(np.float32)
    x_test = scaler.transform(test_df[cols].values).astype(np.float32)
    c_train = one_hot_covariates(train_df[["DIA", "PTGENDER", "AGE"]])
    c_test = one_hot_covariates(test_df[["DIA", "AGE", "PTGENDER"]])
    return (x_train, c_train, x_test, c_test,
            np.asarray(test_df["DIA"].values))


def _train_torch(x_train, c_train, x_test, c_test, seed):
    """Reference-equivalent single-modality cVAE (cVAE.py:140-206 math)."""
    torch.manual_seed(seed)
    d = x_train.shape[1]

    class Enc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(d + C_DIM, HIDDEN[0])
            self.l2 = torch.nn.Linear(HIDDEN[0], HIDDEN[1])
            self.mu = torch.nn.Linear(HIDDEN[1], LATENT)
            self.lv = torch.nn.Linear(HIDDEN[1], LATENT)

        def forward(self, x, c):
            h = torch.nn.functional.leaky_relu(
                self.l1(torch.cat([x, c], 1)))
            h = torch.nn.functional.leaky_relu(self.l2(h))
            return self.mu(h), self.lv(h)

    class Dec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = torch.nn.Linear(LATENT + C_DIM, HIDDEN[1])
            self.l2 = torch.nn.Linear(HIDDEN[1], HIDDEN[0])
            self.mean = torch.nn.Linear(HIDDEN[0], d)
            self.lvo = torch.nn.Parameter(torch.full((1, d), -3.0))

        def forward(self, z, c):
            h = torch.nn.functional.leaky_relu(
                self.l1(torch.cat([z, c], 1)))
            h = torch.nn.functional.leaky_relu(self.l2(h))
            return self.mean(h)

    enc, dec = Enc(), Dec()
    opt = torch.optim.Adam(list(enc.parameters()) + list(dec.parameters()),
                           lr=1e-4)
    xt = torch.from_numpy(x_train)
    ct = torch.from_numpy(c_train)
    for _ in range(EPOCHS):
        for start in range(0, len(xt), BATCH):
            xb, cb = xt[start:start + BATCH], ct[start:start + BATCH]
            mu, lv = enc(xb, cb)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            mean = dec(z, cb)
            ll = (-0.5 * (xb - mean) ** 2 * torch.exp(-dec.lvo)
                  - 0.5 * dec.lvo - 0.9189385332046727).sum(1).mean(0)
            kl = -0.5 * (1 + lv - mu ** 2 - lv.exp()).sum(1).mean(0)
            loss = kl - ll
            opt.zero_grad()
            loss.backward()
            opt.step()

    with torch.no_grad():
        xs, cs = torch.from_numpy(x_test), torch.from_numpy(c_test)
        mu, lv = enc(xs, cs)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
        recon = dec(z, cs).numpy()
    return np.sum((x_test - recon) ** 2, axis=1) / x_test.shape[1]


def _train_jax(x_train, c_train, x_test, c_test, seed):
    model = build_model("cVAE_multimodal", [x_train.shape[1]], HIDDEN,
                        LATENT, C_DIM, 1)
    params = model.init_params(jax.random.PRNGKey(seed))
    config = TrainConfig(epochs=EPOCHS, batch_size=BATCH, combine="poe")
    trainer = FoldTrainer(model, config, x_train.shape[0])
    params, _ = trainer.run(params, [x_train], [c_train],
                            key=jax.random.PRNGKey(seed + 1))
    recon = np.asarray(model.pred_recon(
        params, [x_test], [c_test], jax.random.PRNGKey(seed + 2), "poe")[0])
    return np.sum((x_test - recon) ** 2, axis=1) / x_test.shape[1]


@pytest.mark.slow
def test_deviation_auc_parity_with_torch_reference(tmp_path):
    x_train, c_train, x_test, c_test, dia = _prepare(tmp_path)

    aucs = {"torch": [], "jax": []}
    for seed in (0, 1, 2):
        for name, fn in (("torch", _train_torch), ("jax", _train_jax)):
            dev = fn(x_train, c_train, x_test, c_test, seed)
            auc, *_ = classification_performance(
                dev[dia == 2], dev[dia == 0], "nm")
            aucs[name].append(auc)

    torch_mean = np.mean(aucs["torch"])
    jax_mean = np.mean(aucs["jax"])
    # both must detect the signal and agree within seed noise
    assert torch_mean > 0.7 and jax_mean > 0.7, aucs
    assert abs(torch_mean - jax_mean) < 0.05, aucs
