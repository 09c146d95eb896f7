"""Explicit-collective data-parallel training step via shard_map.

The default scaling path lets GSPMD place the gradient psum automatically
(mesh.py + jit in_shardings). This module is the manually-scheduled
equivalent — shard_map over the 'data' mesh axis with an explicit
``jax.lax.pmean`` on the gradients — for cases where collective placement
must be pinned by hand (and as the reference implementation for verifying
the GSPMD path's semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def build_dp_step_shardmap(model, optimizer: optax.GradientTransformation,
                           combine: str, mesh: Mesh):
    """step(params, opt_state, xes, cs, key) -> (params, opt_state, loss).

    Parameters/optimizer state are replicated; each 'data' shard computes
    the gradient of its batch rows' mean loss and pmean combines them.
    The reparameterization key is fold_in-decorrelated per shard — with a
    replicated key every shard would draw IDENTICAL noise (duplicated
    epsilon rows, biased gradients). Per-shard draws therefore differ from
    the unsharded step's single (B, Z) draw: the sharded step is the same
    estimator, not the same sample (exact draw parity across shard counts
    is impossible with per-shard sampling).
    """

    def loss_fn(params, xes, cs, key):
        fwd = model.forward(params, list(xes), list(cs), key, combine)
        losses = model.loss(params, list(xes), fwd)
        return losses["total"]

    n_data = mesh.shape["data"]

    def shard_body(params, opt_state, xes, cs, key):
        if n_data > 1:
            # decorrelate the per-shard noise draws (see docstring); the
            # single-shard step stays bit-identical to the unsharded one
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        # per-shard grads over the local rows, explicitly averaged over the
        # 'data' axis (the collective GSPMD would otherwise insert for us)
        loss, grads = jax.value_and_grad(loss_fn)(params, xes, cs, key)
        grads = jax.lax.pmean(grads, axis_name="data")
        loss = jax.lax.pmean(loss, axis_name="data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    replicated = P()
    sharded_rows = P("data", None)
    wrapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(replicated, replicated,
                  (sharded_rows,) * model.modalities,
                  (sharded_rows,) * model.modalities,
                  replicated),
        out_specs=(replicated, replicated, replicated),
        check_vma=False,
    )

    def step(params, opt_state, xes, cs, key):
        xes = tuple(jnp.asarray(x) for x in xes)
        cs = tuple(jnp.asarray(c) for c in cs)
        return wrapped(params, opt_state, xes, cs, key)

    return jax.jit(step)
