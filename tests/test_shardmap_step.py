"""Explicit shard_map data-parallel step: wiring + collective correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.parallel.mesh import make_mesh
from multi_modal_normative_modeling_tpu.parallel.shardmap_step import (
    build_dp_step_shardmap,
)

DIMS, C, Z, B = [20, 28], 5, 6, 32


def _problem():
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", DIMS, [12, 12], Z, C, len(DIMS))
    params = model.init_params(jax.random.PRNGKey(0))
    xes = tuple(rng.normal(size=(B, d)).astype(np.float32) for d in DIMS)
    cs = tuple([rng.normal(size=(B, C)).astype(np.float32)] * len(DIMS))
    return model, params, xes, cs


def test_single_shard_matches_unsharded():
    model, params, xes, cs = _problem()
    opt = optax.adam(1e-3)
    mesh = make_mesh(n_fold=1, n_data=1, devices=jax.devices()[:1])
    step = build_dp_step_shardmap(model, opt, "poe", mesh)
    key = jax.random.PRNGKey(7)
    new_params, _, loss = step(params, opt.init(params), xes, cs, key)

    # unsharded reference
    def loss_fn(p):
        fwd = model.forward(p, list(xes), list(cs), key, "poe")
        return model.loss(p, list(xes), fwd)["total"]

    ref_loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    ref_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        new_params, ref_params)


def test_multi_shard_runs_and_replicates():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    model, params, xes, cs = _problem()
    opt = optax.adam(1e-3)
    mesh = make_mesh(n_fold=1, n_data=4, devices=jax.devices()[:4])
    step = build_dp_step_shardmap(model, opt, "gpoe", mesh)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(3)
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, xes, cs,
                                       jax.random.fold_in(key, i))
        assert np.isfinite(float(loss))
    # the pmean keeps parameters replicated across shards
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.sharding.is_fully_replicated


def test_multi_shard_noise_is_decorrelated():
    """A replicated PRNG key would make every 'data' shard draw IDENTICAL
    reparameterization noise: with the batch's second half duplicating the
    first, the 2-shard loss would then equal the unsharded half-batch loss
    exactly. The fold_in decorrelation must break that equality."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    model, params, xes, cs = _problem()
    half = B // 2
    xes_dup = tuple(np.concatenate([x[:half], x[:half]]) for x in xes)
    cs_dup = tuple(np.concatenate([c[:half], c[:half]]) for c in cs)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(11)

    mesh = make_mesh(n_fold=1, n_data=2, devices=jax.devices()[:2])
    step = build_dp_step_shardmap(model, opt, "poe", mesh)
    _, _, sharded_loss = step(params, opt.init(params), xes_dup, cs_dup, key)

    def half_loss_fn(p):
        fwd = model.forward(p, [x[:half] for x in xes_dup],
                            [c[:half] for c in cs_dup], key, "poe")
        return model.loss(p, [x[:half] for x in xes_dup], fwd)["total"]

    half_loss = float(half_loss_fn(params))
    assert np.isfinite(float(sharded_loss))
    assert abs(float(sharded_loss) - half_loss) > 1e-6
