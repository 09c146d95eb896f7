"""Generate golden p-values for latent_pvalues (utils_vae.py:163-174 parity).

statsmodels is not installable in this image, so the golden values are
computed by an INDEPENDENT high-precision oracle implementing exactly the
statistics statsmodels reports:

  * OLS:   coefficients via QR (not the lstsq+inv path the production code
           uses), two-sided t-test p = 2*t.sf(|beta/bse|, n-k) with
           bse^2 = sigma2 * diag((X'X)^-1), sigma2 = RSS/(n-k)
           (statsmodels OLSResults.pvalues semantics).
  * Logit: MLE via damped Newton on the exact log-likelihood iterated to
           |step| < 1e-13 in long double, Wald z-test p = 2*norm.sf(|z|)
           with covariance = inverse observed information at the MLE
           (statsmodels LogitResults.pvalues semantics; Logit.fit uses the
           same Newton iteration).

The survival functions are evaluated with mpmath (50 decimal digits) and
rounded to float64, so the fixture is correct to well below the test's 1e-8
tolerance. Inputs are regenerated in the test from the same seed recipe.

Run: python tests/fixtures/gen_latent_pvalues_golden.py  (rewrites the JSON)
"""
import json
from pathlib import Path

import mpmath as mp
import numpy as np

mp.mp.dps = 50


def make_inputs():
    rng = np.random.default_rng(1234)
    n, d = 48, 3
    latent = rng.normal(size=(n, d))
    # continuous target correlated with latent dim 0
    target_cont = 1.5 * latent[:, 0] - 0.4 * latent[:, 2] + rng.normal(
        scale=0.8, size=n)
    # binary target correlated with latent dim 1
    logits = 1.2 * latent[:, 1] - 0.3
    target_bin = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-logits))).astype(
        float)
    return latent, target_cont, target_bin


def t_sf(x, dof):
    """Student-t survival function at 50 digits."""
    x = mp.mpf(float(x))
    dof = mp.mpf(int(dof))
    # P(T > x) = 0.5 * I_{dof/(dof+x^2)}(dof/2, 1/2) for x >= 0
    assert x >= 0
    return 0.5 * mp.betainc(dof / 2, mp.mpf(1) / 2,
                            0, dof / (dof + x * x), regularized=True)


def norm_sf(x):
    return mp.erfc(mp.mpf(float(x)) / mp.sqrt(2)) / 2


def ols_pvalues(y, X):
    q, r = np.linalg.qr(X)
    beta = np.linalg.solve(r, q.T @ y)
    resid = y - X @ beta
    dof = X.shape[0] - X.shape[1]
    sigma2 = float(resid @ resid) / dof
    rinv = np.linalg.inv(r)
    cov = sigma2 * (rinv @ rinv.T)
    tvals = beta / np.sqrt(np.diag(cov))
    return [float(2 * t_sf(abs(t), dof)) for t in tvals]


def logit_pvalues(y, X):
    beta = np.zeros(X.shape[1], dtype=np.longdouble)
    Xl = X.astype(np.longdouble)
    yl = y.astype(np.longdouble)
    for _ in range(200):
        p = 1.0 / (1.0 + np.exp(-Xl @ beta))
        w = p * (1.0 - p)
        hess = Xl.T @ (Xl * w[:, None])
        grad = Xl.T @ (yl - p)
        step = np.linalg.solve(hess.astype(np.float64),
                               grad.astype(np.float64)).astype(np.longdouble)
        # damping for safety (never triggers on this data)
        while np.max(np.abs(step)) > 50:
            step = step / 2
        beta = beta + step
        if np.max(np.abs(step)) < 1e-13:
            break
    p = 1.0 / (1.0 + np.exp(-Xl @ beta))
    w = p * (1.0 - p)
    cov = np.linalg.inv((Xl.T @ (Xl * w[:, None])).astype(np.float64))
    z = beta.astype(np.float64) / np.sqrt(np.diag(cov))
    return [float(2 * norm_sf(abs(v))) for v in z]


def main():
    latent, target_cont, target_bin = make_inputs()
    golden = {"continuous": [], "binary": []}
    for i in range(latent.shape[1]):
        X = np.column_stack([np.ones(len(latent)), latent[:, i]])
        golden["continuous"].append(ols_pvalues(target_cont, X))
        golden["binary"].append(logit_pvalues(target_bin, X))
    out = Path(__file__).with_name("latent_pvalues_golden.json")
    out.write_text(json.dumps(golden, indent=1))
    print("wrote", out)
    print(json.dumps(golden, indent=1))


if __name__ == "__main__":
    main()
