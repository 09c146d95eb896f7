"""MLP parameter initialization and application as pure functions.

Parameters are plain pytrees (dicts of jnp arrays) so that per-fold parameter
stacks vmap cleanly. Initialization reproduces torch ``nn.Linear`` defaults —
weight and bias both ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform
with a=sqrt(5)) — so the rebuilt models start from the same distribution as
the reference (exact draws differ; AUC tolerance absorbs that, SURVEY.md Q2).

Weights are stored as [fan_in, fan_out] so the forward pass is a plain
``x @ W + b`` row-major matmul — the layout XLA maps directly onto the MXU.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def init_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32) -> dict:
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(fan_in)))
    k_w, k_b = jax.random.split(key)
    return {
        "w": jax.random.uniform(k_w, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(k_b, (fan_out,), dtype, -bound, bound),
    }


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32) -> List[dict]:
    """A stack of linear layers for the given layer sizes."""
    keys = jax.random.split(key, max(len(sizes) - 1, 1))
    return [
        init_linear(keys[i], sizes[i], sizes[i + 1], dtype)
        for i in range(len(sizes) - 1)
    ]


def apply_linear(layer: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ layer["w"] + layer["b"]


def apply_mlp(layers: Sequence[dict], x: jnp.ndarray, activation=None,
              final_activation=None) -> jnp.ndarray:
    """Apply the stack; ``activation`` after every layer but the last,
    ``final_activation`` after the last."""
    h = x
    for i, layer in enumerate(layers):
        h = apply_linear(layer, h)
        if i < len(layers) - 1 and activation is not None:
            h = activation(h)
    if final_activation is not None:
        h = final_activation(h)
    return h


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.leaky_relu default (negative_slope=0.01)."""
    return jax.nn.leaky_relu(x, negative_slope=0.01)
