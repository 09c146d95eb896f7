"""Optimizer-state checkpoint / kill-and-resume (beyond-parity: the reference
pickles params only, train:211-212; this framework's cold compiles cost
60-350 s so killed sweeps must resume bit-identically)."""
import argparse

import jax
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import train_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import (
    FoldTrainer,
    TrainConfig,
    load_checkpoint,
)
from multi_modal_normative_modeling_tpu.train.checkpoints import (
    train_state_exists,
)

DIMS = [18, 12]
C = 3


def _problem(n=21, seed=0):
    rng = np.random.default_rng(seed)
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = [rng.normal(size=(n, C)).astype(np.float32)] * len(DIMS)
    return data, cov


def _model():
    return build_model("cVAE_multimodal", DIMS, [10, 8], 4, C, len(DIMS))


def _assert_trees_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_chunked_equals_single_scan(tmp_path):
    model = _model()
    data, cov = _problem()
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    config = TrainConfig(epochs=10, batch_size=8, combine="gpoe")

    ref_tr = FoldTrainer(model, config, 21)
    p_ref, logs_ref = ref_tr.run(params, data, cov, key=key)

    tr = FoldTrainer(model, config, 21)
    p_chk, logs_chk = tr.run_resumable(params, data, cov, key,
                                       state_dir=tmp_path,
                                       checkpoint_every=4)
    _assert_trees_equal(p_chk, p_ref)
    for k in logs_ref:
        np.testing.assert_array_equal(logs_chk[k], np.asarray(logs_ref[k]))
    assert train_state_exists(tmp_path)


def test_kill_and_resume_bit_identical(tmp_path):
    """Train 6/10 epochs, 'die', resume with a FRESH trainer to 10 — final
    params bit-equal to the uninterrupted 10-epoch run."""
    model = _model()
    data, cov = _problem(seed=1)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    ref = FoldTrainer(model, TrainConfig(epochs=10, batch_size=8,
                                         combine="moe"), 21)
    p_ref, logs_ref = ref.run(params, data, cov, key=key)

    # phase 1: killed after 6 epochs (complete run at a shorter -E)
    t1 = FoldTrainer(model, TrainConfig(epochs=6, batch_size=8,
                                        combine="moe"), 21)
    t1.run_resumable(params, data, cov, key, state_dir=tmp_path,
                     checkpoint_every=3)
    # phase 2: new process/trainer resumes from disk and finishes
    t2 = FoldTrainer(model, TrainConfig(epochs=10, batch_size=8,
                                        combine="moe"), 21)
    p_res, logs_res = t2.run_resumable(params, data, cov, key,
                                       state_dir=tmp_path,
                                       checkpoint_every=3, resume=True)
    _assert_trees_equal(p_res, p_ref)
    np.testing.assert_array_equal(logs_res["total"],
                                  np.asarray(logs_ref["total"]))


def test_resume_with_cyclic_schedule(tmp_path):
    """The optax schedule's step count lives in the checkpointed state, so a
    resumed cyclic-LR run stays on the schedule."""
    model = _model()
    data, cov = _problem(seed=2)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    mk = lambda e: TrainConfig(epochs=e, batch_size=8, combine="gpoe",
                               lr_schedule="cyclic", base_lr=1e-4,
                               max_lr=5e-3)
    p_ref, _ = FoldTrainer(model, mk(8), 21).run(params, data, cov, key=key)
    FoldTrainer(model, mk(5), 21).run_resumable(
        params, data, cov, key, state_dir=tmp_path, checkpoint_every=5)
    p_res, _ = FoldTrainer(model, mk(8), 21).run_resumable(
        params, data, cov, key, state_dir=tmp_path, checkpoint_every=5,
        resume=True)
    _assert_trees_equal(p_res, p_ref)


def test_fold_parallel_resumable_matches(tmp_path):
    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        stack_fold_batches,
        stack_params,
    )
    import jax.numpy as jnp

    model = _model()
    config = TrainConfig(epochs=9, batch_size=8, combine="gpoe")
    folds = [_problem(seed=s) for s in (3, 4)]
    params_list = [model.init_params(jax.random.PRNGKey(0))] * 2
    keys = jnp.stack([jax.random.PRNGKey(42)] * 2)
    stacked = stack_params(params_list)
    batches = jax.device_put(stack_fold_batches(
        [f[0] for f in folds], [f[1] for f in folds], 8))

    mft = MultiFoldTrainer(model, config, 21)
    p_ref, logs_ref = mft.run(stacked, batches, keys)

    mft2 = MultiFoldTrainer(model, config, 21)
    p_chk, logs_chk = mft2.run_resumable(stacked, batches, keys,
                                         state_dir=tmp_path,
                                         checkpoint_every=4)
    _assert_trees_equal(p_chk, p_ref)
    np.testing.assert_array_equal(logs_chk["total"],
                                  np.asarray(logs_ref["total"]))


def test_epoch_cursor_lives_in_the_atomic_blob(tmp_path):
    """A kill between file writes can never desync cursor and tensors: the
    cursor of record is serialized INSIDE the single atomically-replaced
    blob; the JSON sidecar is informational only."""
    import json

    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        load_train_state,
        save_train_state,
    )

    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    opt = {"count": np.int32(3)}
    save_train_state(tmp_path, params, opt, key, epoch=7,
                     logs={"total": np.arange(7.0)})
    # corrupt the sidecar: load must still report the blob's cursor
    (tmp_path / "train_state.json").write_text(json.dumps({"epoch": 999}))
    template = {"params": params, "opt_state": {"count": np.int32(0)},
                "key": key}
    state, epoch, logs = load_train_state(tmp_path, template)
    assert epoch == 7
    assert int(state["opt_state"]["count"]) == 3
    np.testing.assert_array_equal(logs["total"], np.arange(7.0))


def test_fold_parallel_resumable_with_mesh(tmp_path):
    """run_resumable honors the trainer's mesh like run() (sharded chunks,
    identical results)."""
    import jax.numpy as jnp

    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        make_mesh,
        stack_fold_batches,
        stack_params,
    )

    model = _model()
    config = TrainConfig(epochs=6, batch_size=8, combine="gpoe")
    folds = [_problem(seed=s) for s in (5, 6)]
    params_list = [model.init_params(jax.random.PRNGKey(0))] * 2
    keys = jnp.stack([jax.random.PRNGKey(42)] * 2)
    stacked = stack_params(params_list)
    batches = jax.device_put(stack_fold_batches(
        [f[0] for f in folds], [f[1] for f in folds], 8))
    mesh = make_mesh(n_fold=2, n_data=2, devices=jax.devices()[:4])

    p_ref, logs_ref = MultiFoldTrainer(model, config, 21, mesh=mesh).run(
        stacked, batches, keys)
    p_chk, logs_chk = MultiFoldTrainer(
        model, config, 21, mesh=mesh).run_resumable(
        stacked, batches, keys, state_dir=tmp_path, checkpoint_every=3)
    _assert_trees_equal(p_chk, p_ref)
    np.testing.assert_array_equal(logs_chk["total"],
                                  np.asarray(logs_ref["total"]))


def _cli_args(**overrides):
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[12, 12, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=10, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", checkpoint_every=0, resume=False,
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def test_cli_kill_and_resume(tmp_path):
    """CLI semantics: a run killed at -E 4 (state on disk) resumed with
    -E 10 --resume produces checkpoints bit-equal to a straight -E 10 run."""
    ref_root = tmp_path / "ref"
    res_root = tmp_path / "res"
    for root in (ref_root, res_root):
        root.mkdir()
        make_synthetic_resource(root, "ADNI", n_hc=30,
                                n_disease={0: 10, 1: 10}, effect=0.8)

    train_supervised.main(_cli_args(epochs=10), project_root=ref_root)
    train_supervised.main(_cli_args(epochs=4, checkpoint_every=2),
                          project_root=res_root)
    train_supervised.main(_cli_args(epochs=10, checkpoint_every=2,
                                    resume=True), project_root=res_root)

    for fold in range(2):
        ref_dir = (ref_root / "outputs" / "kfold_analysis" /
                   "supervised_cvae" / f"{fold:03d}")
        res_dir = (res_root / "outputs" / "kfold_analysis" /
                   "supervised_cvae" / f"{fold:03d}")
        p_ref, _ = load_checkpoint(ref_dir)
        p_res, _ = load_checkpoint(res_dir)
        _assert_trees_equal(p_res, p_ref)


def test_load_checkpoint_mismatch_is_actionable(tmp_path):
    """A config/blob pair torn by a kill between the two atomic writes (a
    re-train with a different -H dying mid-save) must fail with an error
    that names the cause, not a cryptic deserialization traceback."""
    from multi_modal_normative_modeling_tpu.cli.common import (
        host_init_params,
        load_model_and_params,
    )
    from multi_modal_normative_modeling_tpu.train import save_checkpoint

    model_a = build_model('cVAE_multimodal', [12], [8, 8], 3, 29, 1)
    config_a = {'model': 'cVAE_multimodal', 'input_dim_list': [12],
                'hidden_dim': [8, 8], 'latent_dim': 3, 'c_dim': 29,
                'modalities': 1, 'non_linear': True, 'combine': 'gpoe'}
    save_checkpoint(tmp_path, host_init_params(model_a), config_a)
    # simulate the torn re-save: new-architecture json beside the old blob
    import json

    config_b = dict(config_a, hidden_dim=[16, 16], latent_dim=5)
    (tmp_path / 'cVAE_model.json').write_text(json.dumps(config_b))
    with pytest.raises(ValueError, match='does not match'):
        load_model_and_params(tmp_path)


def test_fused_kill_and_resume_bit_identical(tmp_path):
    """The fused Pallas train step is resumable too: its state carries the
    PADDED packed params + optax state + PRNG key, and kill-and-resume is
    bit-identical to the uninterrupted fused run."""
    from multi_modal_normative_modeling_tpu.train.fused import (
        FusedFoldTrainer,
    )

    model = _model()
    data, cov = _problem(seed=5)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    mk = lambda e: TrainConfig(epochs=e, batch_size=8, combine="gpoe")

    ref = FusedFoldTrainer(model, mk(8), 21, interpret=True)
    p_ref, logs_ref = ref.run(params, data, cov[0], key=key)

    t1 = FusedFoldTrainer(model, mk(5), 21, interpret=True)
    t1.run_resumable(params, data, cov[0], key, state_dir=tmp_path,
                     checkpoint_every=3)
    assert train_state_exists(tmp_path)
    t2 = FusedFoldTrainer(model, mk(8), 21, interpret=True)
    p_res, logs_res = t2.run_resumable(params, data, cov[0], key,
                                       state_dir=tmp_path,
                                       checkpoint_every=3, resume=True)
    _assert_trees_equal(p_res, p_ref)
    np.testing.assert_array_equal(logs_res["total"],
                                  np.asarray(logs_ref["total"]))


def test_packed_kill_and_resume_bit_identical(tmp_path):
    """PackedFoldTrainer resume: same chunked-state machinery, packed
    pytree format."""
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedFoldTrainer,
    )

    model = _model()
    data, cov = _problem(seed=6)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    mk = lambda e: TrainConfig(epochs=e, batch_size=8, combine="gpoe",
                               shuffle=False)

    p_ref, logs_ref = PackedFoldTrainer(model, mk(8), 21).run(
        params, data, cov[0], key=key)
    PackedFoldTrainer(model, mk(5), 21).run_resumable(
        params, data, cov[0], key, state_dir=tmp_path, checkpoint_every=3)
    assert train_state_exists(tmp_path)
    p_res, logs_res = PackedFoldTrainer(model, mk(8), 21).run_resumable(
        params, data, cov[0], key, state_dir=tmp_path, checkpoint_every=3,
        resume=True)
    _assert_trees_equal(p_res, p_ref)
    np.testing.assert_array_equal(logs_res["total"],
                                  np.asarray(logs_ref["total"]))


def test_packed_fold_parallel_resumable_matches(tmp_path):
    """PackedMultiFoldTrainer resume: one whole-run state over the stacked
    fold axis, bit-identical to the single-scan fold-parallel run."""
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedMultiFoldTrainer,
    )

    model = _model()
    mk = lambda e: TrainConfig(epochs=e, batch_size=8, combine="gpoe",
                               shuffle=False)
    folds = [_problem(seed=s) for s in (7, 8)]
    params_list = [model.init_params(jax.random.PRNGKey(0))] * 2
    keys = [jax.random.PRNGKey(42)] * 2

    ref = PackedMultiFoldTrainer(model, mk(8), 21)
    p_ref, logs_ref = ref.run(params_list, folds, keys)

    PackedMultiFoldTrainer(model, mk(5), 21).run_resumable(
        params_list, folds, keys, state_dir=tmp_path, checkpoint_every=3)
    p_res, logs_res = PackedMultiFoldTrainer(model, mk(8), 21).run_resumable(
        params_list, folds, keys, state_dir=tmp_path, checkpoint_every=3,
        resume=True)
    for f in range(2):
        _assert_trees_equal(p_res[f], p_ref[f])
        np.testing.assert_array_equal(logs_res[f]["total"],
                                      np.asarray(logs_ref[f]["total"]))


def test_run_folds_checkpoint_without_state_dir_is_actionable():
    """checkpoint_every > 0 with state_dir=None must raise a clear error,
    not a bare TypeError from Path(None) (advisor r4)."""
    from multi_modal_normative_modeling_tpu.cli.common import run_folds

    model = build_model("cVAE_multimodal", [6, 4], [8], 3, 2, 2)
    config = TrainConfig(epochs=2, batch_size=4, combine="gpoe")
    with pytest.raises(SystemExit, match="state_dir"):
        run_folds(model, config, [], [], [], False, checkpoint_every=1)


def test_grouped_resume_notices_stale_padded_state(tmp_path, capsys):
    """A leftover padded-layout state dir next to a grouped resume prints
    the routing-migration notice (advisor r4) instead of silently orphaning
    the old state."""
    from multi_modal_normative_modeling_tpu.train.grouped import (
        notice_stale_padded_state,
        packed_state_dirname,
    )

    (tmp_path / packed_state_dirname(False)).mkdir()
    notice_stale_padded_state(tmp_path, "grouped")
    out = capsys.readouterr().out
    assert "padded-layout resume state" in out
    assert "width-grouped" in out
    # per-fold variant, and silence when nothing is stale / not grouped
    (tmp_path / packed_state_dirname(False, 2)).mkdir()
    notice_stale_padded_state(tmp_path, "grouped", fold=2)
    assert "padded-layout" in capsys.readouterr().out
    notice_stale_padded_state(tmp_path, "grouped", fold=1)
    notice_stale_padded_state(tmp_path, "padded")
    assert capsys.readouterr().out == ""
