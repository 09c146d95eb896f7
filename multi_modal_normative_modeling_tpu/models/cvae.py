"""Conditional encoder/decoder building blocks (pure functions).

Re-designs the reference ``Encoder``/``Decoder`` modules (cVAE.py:140-206) as
parameter pytrees + apply functions:

  Encoder: concat(x, c) -> hidden linears (+LeakyReLU when non_linear) ->
           parallel mu / logvar heads.
  Decoder: concat(z, c) -> reversed hidden linears (+LeakyReLU) -> mean head,
           plus a learnable homoscedastic output logvar initialized to -3
           (cVAE.py:193-194); the reconstruction distribution is
           N(mean, exp(logvar_out)).

With hz_para_list [110, 110, 10]: encoder (in+c)->110->110 with heads 110->10;
decoder (10+c)->110->110->in.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..ops.linear import apply_linear, init_linear, init_mlp, leaky_relu


def init_encoder(key, input_dim: int, hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, dtype=jnp.float32) -> dict:
    sizes = [input_dim + c_dim] + list(hidden_dim)
    k_hidden, k_mu, k_lv = jax.random.split(key, 3)
    return {
        "hidden": init_mlp(k_hidden, sizes, dtype),
        "mu": init_linear(k_mu, sizes[-1], latent_dim, dtype),
        "logvar": init_linear(k_lv, sizes[-1], latent_dim, dtype),
    }


def apply_encoder(params: dict, x: jnp.ndarray, c: jnp.ndarray,
                  non_linear: bool):
    h = jnp.concatenate([x, c], axis=1)
    for layer in params["hidden"]:
        h = apply_linear(layer, h)
        if non_linear:
            h = leaky_relu(h)
    return apply_linear(params["mu"], h), apply_linear(params["logvar"], h)


def init_decoder(key, input_dim: int, hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, init_logvar: float = -3.0,
                 dtype=jnp.float32) -> dict:
    rev = list(hidden_dim)[::-1]
    sizes = [latent_dim + c_dim] + rev
    k_hidden, k_mean = jax.random.split(key)
    return {
        "hidden": init_mlp(k_hidden, sizes, dtype),
        "mean": init_linear(k_mean, sizes[-1], input_dim, dtype),
        "logvar_out": jnp.full((1, input_dim), init_logvar, dtype),
    }


def apply_decoder(params: dict, z: jnp.ndarray, c: jnp.ndarray,
                  non_linear: bool):
    """Returns (mean, logvar_out) of the reconstruction Normal."""
    h = jnp.concatenate([z, c.reshape(z.shape[0], -1)], axis=1)
    for layer in params["hidden"]:
        h = apply_linear(layer, h)
        if non_linear:
            h = leaky_relu(h)
    return apply_linear(params["mean"], h), params["logvar_out"]


def init_discriminator(key, hz_para_list: Sequence[int],
                       dtype=jnp.float32) -> dict:
    """Latent discriminator z -> scalar logit (cVAE.py:210-237; legacy
    adversarial-AAE head — constructed but unused by the live multimodal
    training paths; provided for API completeness).

    ``hz_para_list`` is the FULL reference list with the latent dim LAST
    (the discriminator walks it reversed, latent-in), unlike the
    encoder/decoder initializers whose hidden_dim excludes the latent."""
    rev = list(hz_para_list)[::-1]
    k_hidden, k_out = jax.random.split(key)
    return {
        "hidden": init_mlp(k_hidden, rev, dtype),
        "out": init_linear(k_out, rev[-1], 1, dtype),
    }


def apply_discriminator(params: dict, z: jnp.ndarray,
                        non_linear: bool) -> jnp.ndarray:
    h = z
    for layer in params["hidden"]:
        h = apply_linear(layer, h)
        if non_linear:
            h = leaky_relu(h)
    return apply_linear(params["out"], h)


def reparameterize(key, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(0.5 * logvar) (cVAE.py:1130-1133)."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)


def init_classifier(key, latent_dim: int, layers: Sequence[int],
                    num_classes: int = 2, dtype=jnp.float32) -> dict:
    """Latent classifier head (cVAE.py:2004-2018): per block Linear ->
    BatchNorm1d -> ReLU -> Dropout, then a final Linear to num_classes.

    BatchNorm running statistics live in the returned ``state`` pytree and
    are updated by apply_classifier in train mode (momentum 0.1, eps 1e-5 —
    torch defaults).
    """
    sizes = [latent_dim] + list(layers)
    keys = jax.random.split(key, len(sizes))
    blocks: List[dict] = []
    state: List[dict] = []
    for i in range(len(sizes) - 1):
        blocks.append({
            "linear": init_linear(keys[i], sizes[i], sizes[i + 1], dtype),
            "bn_scale": jnp.ones((sizes[i + 1],), dtype),
            "bn_bias": jnp.zeros((sizes[i + 1],), dtype),
        })
        state.append({
            "mean": jnp.zeros((sizes[i + 1],), dtype),
            "var": jnp.ones((sizes[i + 1],), dtype),
        })
    params = {"blocks": blocks,
              "out": init_linear(keys[-1], sizes[-1], num_classes, dtype)}
    return {"params": params, "state": state}


def apply_classifier(params: dict, state: List[dict], z: jnp.ndarray,
                     key, dropout_rate: float, train: bool,
                     mask: jnp.ndarray | None = None):
    """Returns (logits, new_state)."""
    h = z
    new_state = []
    for i, block in enumerate(params["blocks"]):
        h = apply_linear(block["linear"], h)
        if train:
            if mask is None:
                mean = jnp.mean(h, axis=0)
                var = jnp.var(h, axis=0)
                n = h.shape[0]
            else:
                m = mask.astype(h.dtype)[:, None]
                n = jnp.maximum(jnp.sum(mask.astype(h.dtype)), 1.0)
                mean = jnp.sum(h * m, axis=0) / n
                var = jnp.sum(((h - mean) ** 2) * m, axis=0) / n
            # torch tracks the *unbiased* variance in running stats, detached
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            new_state.append(jax.lax.stop_gradient({
                "mean": 0.9 * state[i]["mean"] + 0.1 * mean,
                "var": 0.9 * state[i]["var"] + 0.1 * unbiased,
            }))
        else:
            mean, var = state[i]["mean"], state[i]["var"]
            new_state.append(state[i])
        h = (h - mean) / jnp.sqrt(var + 1e-5)
        h = h * block["bn_scale"] + block["bn_bias"]
        h = jax.nn.relu(h)
        if train and dropout_rate > 0.0:
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, h.shape)
            h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    return apply_linear(params["out"], h), new_state
