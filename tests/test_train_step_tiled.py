"""Tiled fused train-step kernel: grid accumulation vs jax.grad and vs the
single-block kernel (kernels/train_step_tiled.py). The tiled architecture
targets the wide-feature (PPMI 3x3485) regime the single-block kernel was
falsified on (RESULTS.md round-2 fused-width table)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.kernels.train_step import (
    FusedTrainStep,
)
from multi_modal_normative_modeling_tpu.kernels.train_step_tiled import (
    TiledFusedTrainStep,
)
from multi_modal_normative_modeling_tpu.models.stacked import (
    StackedMultimodalCVAE,
)
from tests.test_train_step_kernel import (
    _make_problem,
    _reference_loss,
)

B = 20  # > tile_b so the grid really accumulates across tiles


def _problem(hidden, dims=(24, 40, 16), seed=0, b=B):
    import tests.test_train_step_kernel as base

    old = base.B
    base.B = b
    try:
        return _make_problem(hidden, list(dims), seed)
    finally:
        base.B = old


@pytest.mark.parametrize("combine", ["gpoe", "poe", "moe", "mopoe"])
def test_tiled_grads_match_autodiff(combine):
    model, params, xp, c, eps, rowmask = _problem([12, 12])
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, combine)
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)

    step = TiledFusedTrainStep(model, combine, tile_b=8, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)

    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5),
        grads, ref_grads)


def test_tiled_grads_match_autodiff_at_ppmi_width():
    """Gradient parity AT the target width (3x3485, flagship hiddens):
    the small-width parametrized cases exercise the math; this one pins the
    actual wide-regime shapes (lane padding 3485->3584, multi-tile grid)."""
    model, params, xp, c, eps, rowmask = _problem(
        [110, 110], dims=(3485, 3485, 3485), seed=3, b=16)
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)

    step = TiledFusedTrainStep(model, "gpoe", tile_b=8, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)

    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-5),
        grads, ref_grads)


@pytest.mark.parametrize("hidden", [[14], [12, 12], [20, 12, 8]],
                         ids=["1hidden", "2hidden", "3hidden"])
def test_tiled_grads_any_depth(hidden):
    model, params, xp, c, eps, rowmask = _problem(hidden, seed=2)
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)
    step = TiledFusedTrainStep(model, "gpoe", tile_b=8, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)
    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5),
        grads, ref_grads)


def test_tiled_matches_single_block_kernel():
    """Sum-over-tiles must reproduce the single-block kernel's full-batch
    gradients (same padded layout, same math) to fp32 reassociation
    tolerance."""
    model, params, xp, c, eps, rowmask = _problem([12, 12], seed=3)
    single = FusedTrainStep(model, "gpoe", interpret=True)
    tiled = TiledFusedTrainStep(model, "gpoe", tile_b=8, interpret=True)
    ls, gs = single.loss_and_grads(params, xp, c, eps, rowmask)
    lt, gt = tiled.loss_and_grads(params, xp, c, eps, rowmask)
    np.testing.assert_allclose(float(lt["total"]), float(ls["total"]),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6),
        gt, gs)


def test_tiled_single_modality_and_ragged_tail():
    """M==1 shortcut + a rowmask that zeroes the whole last tile (the
    all-padding tile must contribute exactly nothing)."""
    model, params, xp, c, eps, _ = _problem([12, 12], dims=(30,), seed=1)
    rowmask = jnp.asarray(
        np.r_[np.ones(10), np.zeros(B - 10)].astype(np.float32))
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)
    step = TiledFusedTrainStep(model, "gpoe", tile_b=8, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)
    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5),
        grads, ref_grads)


def test_tiled_bf16_grads_track_fp32_autodiff():
    """bf16 compute (bf16-resident weights/tiles, fp32 accumulation) stays
    within bf16 quantization distance of the fp32 gradients: the check is
    a normalized error bound per leaf, not elementwise closeness."""
    model, params, xp, c, eps, rowmask = _problem([12, 12], seed=4)
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)
    step = TiledFusedTrainStep(model, "gpoe", tile_b=16,
                               compute_dtype=jnp.bfloat16, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)
    assert abs(float(losses["total"]) - float(ref_total)) \
        / abs(float(ref_total)) < 2e-2

    def rel_err(a, b_):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        denom = np.linalg.norm(b_) + 1e-12
        return np.linalg.norm(a - b_) / denom

    errs = jax.tree_util.tree_map(rel_err, grads, ref_grads)
    for leaf in jax.tree_util.tree_leaves(errs):
        assert leaf < 6e-2, errs


def test_bf16_cast_exec_casts_only_matmul_weights():
    model = StackedMultimodalCVAE([24, 16], [12, 12], 6, 5, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    step = TiledFusedTrainStep(model, "gpoe", tile_b=16,
                               compute_dtype=jnp.bfloat16, interpret=True)
    exec_p = step.cast_exec(step.pad_params(params))
    for k, v in exec_p.items():
        if any(k.startswith(p) for p in
               ("enc_w", "dec_w", "wmu", "wlv", "vm")):
            assert v.dtype == jnp.bfloat16, k
        else:
            assert v.dtype == jnp.float32, k


def test_tiled_vmem_estimate_and_tile_choice():
    """PPMI width (3x3485) must be tile-able under the v5e budget — the
    exact regime the single-block kernel could not compile at batch 256."""
    from multi_modal_normative_modeling_tpu.kernels.train_step import (
        VMEM_BUDGET_LARGE,
    )

    ppmi = StackedMultimodalCVAE([3485, 3485, 3485], [110, 110], 10, 29, 3)
    step = TiledFusedTrainStep(ppmi, "gpoe", interpret=True)
    assert step.fits_vmem(256, VMEM_BUDGET_LARGE)
    assert step.tile_b >= 8
    assert step.vmem_bytes_tiled(step.tile_b) <= VMEM_BUDGET_LARGE
    # bf16 halves the resident weights -> at least as large a tile
    step16 = TiledFusedTrainStep(ppmi, "gpoe", compute_dtype=jnp.bfloat16,
                                 interpret=True)
    assert step16.tile_b >= step.tile_b
    assert step16.vmem_bytes_tiled(step16.tile_b) \
        < step.vmem_bytes_tiled(step.tile_b)
