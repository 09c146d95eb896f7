"""Out-of-core streaming trainer (train/streaming.py): bit-parity with the
resident FoldTrainer, shard edge cases, and kill-and-resume."""
import jax
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import (
    FoldTrainer,
    StreamingFoldTrainer,
    TrainConfig,
    make_batches,
)
from multi_modal_normative_modeling_tpu.train.streaming import (
    shard_plan,
    split_shards,
)

DIMS = [24, 16]


def _problem(n=70, seed=0):
    rng = np.random.default_rng(seed)
    model = build_model("cVAE_multimodal", DIMS, [12, 12], 6, 5, len(DIMS))
    params = model.init_params(jax.random.PRNGKey(0))
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = [rng.normal(size=(n, 5)).astype(np.float32)] * len(DIMS)
    return model, params, data, cov


def _assert_trees_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)), a, b)


@pytest.mark.parametrize("shards", [1, 2, 3])
def test_streaming_bit_identical_to_resident(shards):
    """Same data, same PRNG stream, any shard count -> the streamed
    trajectory and logs are bit-identical to FoldTrainer's (scan chunking
    does not change the op sequence; the per-epoch key split is replayed on
    each epoch's first shard)."""
    model, params, data, cov = _problem(n=70)  # 70 rows / bs 16 -> 5 batches
    config = TrainConfig(epochs=4, batch_size=16, combine="gpoe")

    resident = FoldTrainer(model, config, 70)
    p_ref, logs_ref = resident.run(params, data, cov)

    streaming = StreamingFoldTrainer(model, config, 70, shards=shards)
    p_got, logs_got = streaming.run(params, data, cov)

    _assert_trees_equal(p_got, p_ref)
    for k in logs_ref:
        np.testing.assert_array_equal(logs_got[k], np.asarray(logs_ref[k]))


def test_streaming_more_shards_than_batches_clamps():
    """shards > n_batches degrades gracefully to one batch per shard."""
    model, params, data, cov = _problem(n=30)  # 2 batches of 16
    config = TrainConfig(epochs=2, batch_size=16, combine="moe")
    p_ref, _ = FoldTrainer(model, config, 30).run(params, data, cov)
    p_got, _ = StreamingFoldTrainer(model, config, 30, shards=8).run(
        params, data, cov)
    _assert_trees_equal(p_got, p_ref)


def test_streaming_rejects_shuffle():
    model, _, _, _ = _problem()
    config = TrainConfig(epochs=1, batch_size=16, shuffle=True)
    with pytest.raises(ValueError, match="shuffle"):
        StreamingFoldTrainer(model, config, 70)


def test_split_shards_covers_and_bounds():
    batches = make_batches(
        [np.ones((50, 4), np.float32)], [np.ones((50, 3), np.float32)], 8)
    nb = batches["mask"].shape[0]
    shards = split_shards(batches, 3)
    assert sum(s["mask"].shape[0] for s in shards) == nb
    assert max(s["mask"].shape[0] for s in shards) \
        - min(s["mask"].shape[0] for s in shards) <= 1
    with pytest.raises(ValueError):
        split_shards(batches, 0)
    with pytest.raises(ValueError):
        split_shards(batches, nb + 1)


def test_shard_plan():
    gb = 1 << 30
    assert shard_plan(0, 16 * gb) == 1
    assert shard_plan(4 * gb, 16 * gb) == 1   # 2 resident shards fit easily
    assert shard_plan(20 * gb, 16 * gb) == 3  # 2*20/16 -> 3 shards
    # the plan always leaves 2 shards under budget
    for total in (1, 7, 33, 129):
        s = shard_plan(total * gb, 16 * gb)
        assert 2 * total * gb / s <= 16 * gb or s == 1


def _cli_args(**over):
    import argparse

    base = dict(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="SE-MoE", combine="MoE", epochs=3, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_stream_shards_cli_checkpoints_match_plain(tmp_path):
    """--stream_shards N through the train CLI writes byte-identical fold
    checkpoints to the plain sequential run (bit-identical params ->
    identical msgpack blobs)."""
    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    plain_root = tmp_path / "plain"
    stream_root = tmp_path / "stream"
    for root in (plain_root, stream_root):
        make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 10},
                                seed=7)
    train_supervised.main(_cli_args(), project_root=plain_root)
    train_supervised.main(_cli_args(stream_shards=2),
                          project_root=stream_root)
    rel = "outputs/kfold_analysis/supervised_cvae/000/cVAE_model.ckpt"
    assert (plain_root / rel).read_bytes() == (stream_root / rel).read_bytes()


def test_stream_shards_cli_auto(tmp_path, capsys):
    """--stream_shards -1 auto-sizes via shard_plan (tiny cohort -> 1
    shard) and trains to working checkpoints."""
    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 10},
                            seed=5)
    train_supervised.main(_cli_args(stream_shards=-1), project_root=tmp_path)
    out = capsys.readouterr().out
    assert "--stream_shards auto" in out
    assert (tmp_path / "outputs/kfold_analysis/supervised_cvae/000"
            / "cVAE_model.ckpt").exists()


def test_stream_shards_cli_conflicts(tmp_path):
    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=30, n_disease={0: 10})
    with pytest.raises(SystemExit, match="stream_shards"):
        train_supervised.main(
            _cli_args(stream_shards=2, fold_parallel=True),
            project_root=tmp_path)


def _data_mesh(d):
    from multi_modal_normative_modeling_tpu.parallel import make_mesh

    return make_mesh(n_fold=1, n_data=d, devices=jax.devices()[:d])


@pytest.mark.parametrize("shards", [1, 3])
def test_streaming_meshed_matches_and_is_shard_invariant(shards):
    """--stream_shards x --mesh 1,D composition: each shard's rows shard
    over the 'data' axis. The meshed stream is bit-identical across shard
    counts (same op sequence) and matches the unmeshed run to float
    tolerance (GSPMD's psum reorders partial sums)."""
    model, params, data, cov = _problem(n=70)
    config = TrainConfig(epochs=4, batch_size=16, combine="gpoe")
    mesh = _data_mesh(4)

    p_unmeshed, logs_unmeshed = StreamingFoldTrainer(
        model, config, 70, shards=2).run(params, data, cov)
    p_ref, logs_ref = StreamingFoldTrainer(
        model, config, 70, shards=1, mesh=mesh).run(params, data, cov)
    p_got, logs_got = StreamingFoldTrainer(
        model, config, 70, shards=shards, mesh=mesh).run(params, data, cov)

    _assert_trees_equal(p_got, p_ref)
    for k in logs_ref:
        np.testing.assert_array_equal(logs_got[k], logs_ref[k])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=5e-4, atol=1e-5),
        p_got, p_unmeshed)
    np.testing.assert_allclose(logs_got["total"], logs_unmeshed["total"],
                               rtol=1e-4)


def test_streaming_mesh_geometry_gates():
    model, _, _, _ = _problem()
    config = TrainConfig(epochs=1, batch_size=16)
    with pytest.raises(ValueError, match="'data' mesh axis"):
        StreamingFoldTrainer(model, TrainConfig(epochs=1, batch_size=15),
                             70, mesh=_data_mesh(4))
    from multi_modal_normative_modeling_tpu.parallel import make_mesh

    fold2 = make_mesh(n_fold=2, n_data=2, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="only the 'data' mesh axis"):
        StreamingFoldTrainer(model, config, 70, mesh=fold2)


def test_streaming_meshed_kill_and_resume(tmp_path):
    """Meshed streamed kill-and-resume is bit-identical, the state carries
    a mesh-geometry fingerprint, and a resume under a different data-axis
    size (a different psum order) is refused."""
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    model, params, data, cov = _problem(n=70, seed=3)
    config = TrainConfig(epochs=6, batch_size=16, combine="gpoe")
    key = jax.random.PRNGKey(9)
    mesh = _data_mesh(4)

    straight, logs_straight = StreamingFoldTrainer(
        model, config, 70, shards=2, mesh=mesh).run(params, data, cov,
                                                    key=key)
    half = TrainConfig(epochs=2, batch_size=16, combine="gpoe")
    StreamingFoldTrainer(model, half, 70, shards=2, mesh=mesh).run_resumable(
        params, data, cov, key, tmp_path, checkpoint_every=2)
    meta = peek_train_meta(tmp_path)
    assert meta["path"] == "stream+mesh:data=4"

    with pytest.raises(ValueError, match="refusing to resume"):
        StreamingFoldTrainer(
            model, config, 70, shards=2, mesh=_data_mesh(2)).run_resumable(
                params, data, cov, key, tmp_path, checkpoint_every=2,
                resume=True)

    resumed, logs_resumed = StreamingFoldTrainer(
        model, config, 70, shards=2, mesh=mesh).run_resumable(
            params, data, cov, key, tmp_path, checkpoint_every=2,
            resume=True)
    _assert_trees_equal(resumed, straight)
    for k in logs_straight:
        np.testing.assert_array_equal(logs_resumed[k], logs_straight[k])


def test_stream_shards_cli_with_data_mesh(tmp_path, capsys):
    """--stream_shards 2 --mesh 1,8 trains through the CLI (rows sharded
    over the 8 virtual devices) to working checkpoints; fold/model mesh
    axes are refused."""
    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 10},
                            seed=11)
    train_supervised.main(_cli_args(stream_shards=2, mesh="1,8"),
                          project_root=tmp_path)
    out = capsys.readouterr().out
    assert "rows sharded over mesh" in out
    assert (tmp_path / "outputs/kfold_analysis/supervised_cvae/000"
            / "cVAE_model.ckpt").exists()
    with pytest.raises(SystemExit, match="composes only with"):
        train_supervised.main(_cli_args(stream_shards=2, mesh="2,4"),
                              project_root=tmp_path)


def test_streaming_kill_and_resume_bit_identical(tmp_path):
    """Chunked + resumed streaming run == uninterrupted streaming run ==
    resident run (shared train-state format)."""
    model, params, data, cov = _problem(n=70, seed=3)
    config = TrainConfig(epochs=6, batch_size=16, combine="gpoe")
    key = jax.random.PRNGKey(9)

    straight, logs_straight = StreamingFoldTrainer(
        model, config, 70, shards=2).run(params, data, cov, key=key)

    # interrupted: first 2-epoch chunk writes state, then a fresh trainer
    # resumes from disk
    half = TrainConfig(epochs=2, batch_size=16, combine="gpoe")
    t1 = StreamingFoldTrainer(model, half, 70, shards=2)
    t1.run_resumable(params, data, cov, key, tmp_path, checkpoint_every=2)
    t2 = StreamingFoldTrainer(model, config, 70, shards=2)
    resumed, logs_resumed = t2.run_resumable(
        params, data, cov, key, tmp_path, checkpoint_every=2, resume=True)

    _assert_trees_equal(resumed, straight)
    for k in logs_straight:
        np.testing.assert_array_equal(logs_resumed[k], logs_straight[k])
