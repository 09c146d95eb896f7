"""Tensor-parallel ('model' axis) shardings for wide encoder/decoder MLPs.

The reference has no parallelism at all (single process, one device —
SURVEY.md section 2.6); fold/data parallelism (mesh.py) already covers the
axes its workloads need. This module adds the third TPU-native scaling axis
for the *wide* regimes (PPMI-style 3485-feature modalities, the ADHD sweep's
1024-wide hidden stacks): Megatron-style tensor parallelism over a 'model'
mesh axis.

Scheme (per encoder/decoder MLP, GSPMD annotations only — XLA inserts the
collectives):

  hidden layer 0, 2, ... : column-parallel  W [in, out]  -> P(..., None, 'model')
                            bias [out]       -> P(..., 'model')
                            (activation comes out feature-sharded)
  hidden layer 1, 3, ... : row-parallel      W [in, out]  -> P(..., 'model', None)
                            bias [out]       -> P(..., None)
                            (contraction over the sharded features; XLA
                            inserts the psum, output replicated)
  mu/logvar/mean heads   : row-parallel when the last hidden activation is
                            sharded (hidden depth odd), else replicated —
                            latent dims are tiny, sharding them buys nothing.
  logvar_out / alpha / anything unrecognized: replicated over 'model'.

Every sharded dimension is gated on divisibility by the 'model' axis size
(110-wide flagship layers on a 4-way axis simply stay replicated — the
annotation is a performance hint, never a correctness constraint).

Composes with the existing axes as a ('fold', 'data', 'model') mesh:
stacked per-fold params shard their leading axis over 'fold', batch rows
over 'data', and the weight matrices over 'model'.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh3(n_fold: int = 1, n_data: int = 1, n_model: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """A ('fold', 'data', 'model') mesh; ``n_model`` defaults to filling the
    remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model is None:
        if len(devices) % (n_fold * n_data):
            raise ValueError(
                f"{len(devices)} devices not divisible by fold*data "
                f"{n_fold}x{n_data}")
        n_model = len(devices) // (n_fold * n_data)
    if n_fold * n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_fold}x{n_data}x{n_model} != {len(devices)} devices")
    grid = np.asarray(devices).reshape(n_fold, n_data, n_model)
    return Mesh(grid, ("fold", "data", "model"))


def _dims(leaf) -> tuple:
    return tuple(int(d) for d in np.shape(leaf))


class _SpecBuilder:
    """Builds a PartitionSpec pytree matching a (stacked) parameter tree."""

    def __init__(self, mesh: Mesh, stacked: bool):
        self.axes = set(mesh.axis_names)
        self.n_model = mesh.shape.get("model", 1)
        # leading fold axis on every param leaf when the tree is stacked
        self.lead = ("fold",) if (stacked and "fold" in self.axes) else ()

    def _spec(self, leaf, *tail) -> P:
        """lead + tail, padded with None to the leaf's rank."""
        ndim = np.ndim(leaf)
        tail = list(tail) + [None] * (ndim - len(self.lead) - len(tail))
        return P(*self.lead, *tail)

    def _can(self, leaf, axis_from_end: int) -> bool:
        """Is the leaf's axis (counted from the end) divisible by n_model?"""
        dims = _dims(leaf)
        if self.n_model <= 1 or "model" not in self.axes:
            return False
        if axis_from_end > len(dims) - len(self.lead):
            return False
        return dims[-axis_from_end] % self.n_model == 0

    def replicated(self, tree):
        return jax.tree_util.tree_map(lambda l: self._spec(l), tree)

    def mlp(self, layers):
        """Alternating column/row parallel specs for a hidden stack.

        Returns (specs, act_sharded): whether the stack's output activation
        comes out feature-sharded. A layer whose sharded dim does not divide
        breaks the alternation (stays replicated, output replicated)."""
        specs = []
        act_sharded = False
        for layer in layers:
            w, b = layer["w"], layer["b"]
            if not act_sharded and self._can(w, 1):
                # column parallel: shard the output features
                specs.append({"w": self._spec(w, None, "model"),
                              "b": self._spec(b, "model")})
                act_sharded = True
            elif act_sharded and self._can(w, 2):
                # row parallel: contract over the sharded features (psum)
                specs.append({"w": self._spec(w, "model", None),
                              "b": self._spec(b)})
                act_sharded = False
            else:
                specs.append({"w": self._spec(w), "b": self._spec(b)})
                act_sharded = False
        return specs, act_sharded

    def head(self, layer, act_sharded: bool):
        """mu/logvar/mean head: row-parallel iff its input is sharded."""
        w, b = layer["w"], layer["b"]
        if act_sharded and self._can(w, 2):
            return {"w": self._spec(w, "model", None), "b": self._spec(b)}
        return {"w": self._spec(w), "b": self._spec(b)}

    def module(self, tree):
        """Specs for one encoder/decoder/classifier-like dict."""
        if not isinstance(tree, dict) or "hidden" not in tree:
            return self.replicated(tree)
        out = {}
        specs, act_sharded = self.mlp(tree["hidden"])
        out["hidden"] = specs
        for head in ("mu", "logvar", "mean", "out"):
            if head in tree:
                out[head] = self.head(tree[head], act_sharded)
        for k, v in tree.items():
            if k not in out:
                out[k] = self.replicated(v)
        return out

    def tree(self, tree):
        """Specs for a whole model parameter tree (generic walk: any dict
        containing a 'hidden' stack gets the Megatron scheme, everything
        else is fold-sharded/replicated)."""
        if isinstance(tree, dict):
            if "hidden" in tree:
                return self.module(tree)
            return {k: self.tree(v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            mapped = [self.tree(v) for v in tree]
            return type(tree)(mapped) if isinstance(tree, tuple) else mapped
        return self.replicated(tree)


def tp_param_specs(mesh: Mesh, params_tree, stacked: bool = True):
    """PartitionSpec pytree for a (stacked) model parameter tree under a
    mesh with a 'model' axis (and optionally 'fold')."""
    return _SpecBuilder(mesh, stacked).tree(params_tree)


def fold_model_shardings(mesh: Mesh, params_tree, batches_tree, keys):
    """(params, batches, keys) NamedSharding pytrees for MultiFoldTrainer
    over a ('fold'[, 'data'][, 'model']) mesh: fold axis over 'fold',
    batch rows over 'data', weight matrices tensor-parallel over 'model'.

    Drop-in alternative to mesh.fold_data_shardings (folds.py accepts it via
    ``shardings_fn``)."""
    axes = set(mesh.axis_names)
    specs = tp_param_specs(mesh, params_tree, stacked=True)
    params_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))

    fold = ("fold",) if "fold" in axes else (None,)

    def batch_spec(leaf):
        ndim = np.ndim(leaf)
        tail = [None] * max(ndim - 1, 0)
        # [F, NB, B, ...]: rows shard over 'data' when the mesh has it
        if "data" in axes and ndim >= 3:
            tail[1] = "data"
        return NamedSharding(mesh, P(*fold, *tail))

    batches_sh = jax.tree_util.tree_map(batch_spec, batches_tree)
    keys_sh = NamedSharding(
        mesh, P(*fold, *([None] * (np.ndim(keys) - 1))))
    return params_sh, batches_sh, keys_sh


def _opt_shardings(mesh: Mesh, opt_state, params_tree, params_sh):
    """Sharding pytree for an optax state whose momentum blocks mirror the
    parameter tree (adam's mu/nu): every subtree with the params' treedef
    reuses the params shardings; scalar-ish leaves (count) stay
    fold-sharded/replicated."""
    p_def = jax.tree_util.tree_structure(params_tree)

    def is_param_block(x):
        try:
            return jax.tree_util.tree_structure(x) == p_def
        except Exception:
            return False

    fold = ("fold",) if "fold" in mesh.axis_names else (None,)
    leaves, treedef = jax.tree_util.tree_flatten(
        opt_state, is_leaf=is_param_block)
    out = []
    for leaf in leaves:
        if is_param_block(leaf):
            out.append(params_sh)
        else:
            nd = np.ndim(leaf)
            spec = P(*fold, *([None] * (nd - 1))) if nd else P()
            out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


# folds.py discovers this attribute to shard explicit optimizer-state
# arguments (the chunked/milestone/resumable paths) consistently
fold_model_shardings.opt = _opt_shardings
