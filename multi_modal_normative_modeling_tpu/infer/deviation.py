"""Deviation-score math (utils_vae.py:147-174), numpy/jnp-agnostic.

These are the public deviation utilities of the reference:
  * reconstruction_deviation        per-subject MSE over ROIs (:147-148)
  * reconstruction_deviation_roi    elementwise (x - x_hat)^2 (:151-152)
  * latent_deviation                mean |z-score| over latent dims against
                                    the train-cohort latent distribution
                                    (:155-157)
  * separate_latent_deviation       per-dim latent z-score (:159-161)
  * latent_pvalues                  OLS/Logit p-value per latent dim (:163-174)
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def reconstruction_deviation(x, x_pred):
    x = np.asarray(x)
    x_pred = np.asarray(x_pred)
    return np.sum((x - x_pred) ** 2, axis=1) / x.shape[1]


def reconstruction_deviation_roi(x, x_pred):
    return (np.asarray(x) - np.asarray(x_pred)) ** 2


def latent_deviation(mu_train, mu_sample, var_sample):
    mu_train = np.asarray(mu_train)
    mu_sample = np.asarray(mu_sample)
    var_sample = np.asarray(var_sample)
    var = np.var(mu_train, axis=0)
    return np.sum(
        np.abs(mu_sample - np.mean(mu_train, axis=0)) / np.sqrt(var + var_sample),
        axis=1,
    ) / mu_sample.shape[1]


def separate_latent_deviation(mu_train, mu_sample, var_sample):
    mu_train = np.asarray(mu_train)
    var = np.var(mu_train, axis=0)
    return (np.asarray(mu_sample) - np.mean(mu_train, axis=0)) / np.sqrt(
        var + np.asarray(var_sample)
    )


def latent_pvalues(latent, target, type):
    """Per-latent-dim regression p-values (OLS for continuous targets, Logit
    otherwise), matching utils_vae.py:163-174 including the output frame
    layout (rows 'const'/'latent', one column per latent dim)."""
    import statsmodels.api as sm

    latent = np.asarray(latent)
    pval_df = pd.DataFrame({"labels": ["const", "latent"]})
    for i in range(latent.shape[1]):
        column = sm.add_constant(latent[:, i])
        if type == "continuous":
            fit = sm.OLS(target, column).fit()
        else:
            fit = sm.Logit(target, column).fit()
        pval_df[f"latent {i}"] = list(np.asarray(fit.pvalues))
    return pval_df
