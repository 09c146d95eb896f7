"""Coverage for remaining paths: single-fold scoring, alternate threshold
methods in the analysis CLI, distributed mesh helper."""
import argparse

import jax
import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.cli import (
    group_analysis,
    score,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.parallel.distributed import (
    global_fold_mesh,
)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("misc")
    make_synthetic_resource(root, "ADNI", n_hc=50, n_disease={0: 25, 1: 25},
                            effect=1.0)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=15, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    return root, args


def test_single_fold_scoring(trained):
    root, _ = trained
    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    ids_path = root / "sids.csv"
    y[["IID"]].head(30).to_csv(ids_path, index=False)
    args = argparse.Namespace(
        dataset_resourse="ADNI", procedure="SM-av45", combine="PoE",
        n_splits=2, ids=str(ids_path), fold=1, output=None, roi_output=None,
        seed=42,
    )
    out = score.score(args, project_root=root)
    assert len(out) == 30
    assert np.isfinite(out["deviation"]).all()


@pytest.mark.parametrize("method", ["f1", "eer"])
def test_threshold_methods_through_cli(trained, method):
    root, base = trained
    args = argparse.Namespace(**vars(base), threshold_method=method)
    stats = group_analysis.main(args, project_root=root)
    assert np.isfinite(stats["auc"]).all()


def test_global_fold_mesh():
    mesh = global_fold_mesh(n_folds=4)
    assert set(mesh.axis_names) == {"fold", "data"}
    assert mesh.devices.size == len(jax.devices())


def test_report_generator(trained):
    root, base = trained
    stats = group_analysis.main(base, project_root=root)
    from multi_modal_normative_modeling_tpu.cli.report import generate_report

    report = generate_report(root, "ADNI", "SM-av45",
                             out_path=root / "report.md")
    assert "# Experiment report" in report
    assert "mean ROC-AUC" in report
    assert "Top deviating ROIs" in report
    assert (root / "report.md").exists()

def test_sweep_parser_flag_surface():
    """sweep_endtoend exposes the commands_list9_endtoend grid axes plus the
    common reference flags (reference commands_list9_endtoend.sh loops over
    margin x weightcontrastive on the nm-PM-cont trainer)."""
    from multi_modal_normative_modeling_tpu.cli import common, sweep_endtoend

    parser = sweep_endtoend.build_parser()
    args = parser.parse_args(
        ["-Margins", "0.5", "1.0", "-Weightcontrastives", "0.1",
         "-Layers", "64", "32", "-E", "3", "-K", "2", "-R", "ADNI"])
    common.apply_post_parse_defaults(args, default_procedure="SE-MoE")
    assert args.margins == [0.5, 1.0]
    assert args.weightcontrastives == [0.1]
    assert args.layers == [64, 32]
    assert args.epochs == 3 and args.n_splits == 2
    assert args.procedure == "SE-MoE"
    # common flag surface from the reference trainers is present
    for flag in ("dataset_resourse", "hz_para_list", "combine",
                 "oversample_percentage", "training_class"):
        assert hasattr(args, flag), flag

def test_jaxconfig_cache_setup_idempotent():
    """configure_jax_cache enables the persistent compile cache once; repeat
    calls are no-ops; JAX_PLATFORMS env is honored over the TPU-plugin
    sitecustomize override (see utils/jaxconfig.py)."""
    from multi_modal_normative_modeling_tpu.utils import jaxconfig

    jaxconfig.configure_jax_cache()
    assert jaxconfig._configured
    # conftest pins CPU for the test suite; the env honoring must keep it
    assert jax.default_backend() == "cpu"
    cache_dir = jax.config.jax_compilation_cache_dir
    jaxconfig.configure_jax_cache()  # second call: no change
    assert jax.config.jax_compilation_cache_dir == cache_dir


def test_prepare_modality_memoized(tmp_path):
    """prepare_modality is memoized per (paths, mtimes): sweep engines
    re-enter the test stage per epochs milestone with identical inputs. A
    touched input invalidates; the returned dict is a shallow copy so caller
    key additions don't poison the cache."""
    import os

    from multi_modal_normative_modeling_tpu.cli import common
    from multi_modal_normative_modeling_tpu.data.loading import (
        generate_kfold_ids,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=30, n_disease={0: 10})
    participants = tmp_path / "data" / "ADNI" / "y.csv"
    ids_df = pd.read_csv(participants)
    hc = ids_df[ids_df["DIA"] == 2]
    other = ids_df[ids_df["DIA"] != 2]
    generate_kfold_ids(hc, other, oversample_percentage=1, n_splits=2,
                       project_root=tmp_path)
    kfold_dir = tmp_path / "outputs" / "kfold_analysis"
    train_ids = kfold_dir / "train_ids_000.csv"
    test_ids = kfold_dir / "test_ids_000.csv"

    first = common.prepare_modality(tmp_path, "ADNI", "av45", participants,
                                    train_ids, test_ids)
    first["caller_private"] = object()  # must not leak into the cache
    second = common.prepare_modality(tmp_path, "ADNI", "av45", participants,
                                     train_ids, test_ids)
    assert "caller_private" not in second
    # cache hit: the heavy arrays are the same objects
    assert second["train_data"] is first["train_data"]
    assert second["test_data"] is first["test_data"]

    # touching an input invalidates (mtime_ns key)
    os.utime(train_ids)
    third = common.prepare_modality(tmp_path, "ADNI", "av45", participants,
                                    train_ids, test_ids)
    assert third["train_data"] is not first["train_data"]
    np.testing.assert_array_equal(third["train_data"], first["train_data"])


def test_pr_threshold_finder_survives_nan_f1():
    """precision=recall=0 points yield NaN F1 (0/0); argmax must not return
    the NaN index (reference group_analysis:77-80 would)."""
    from multi_modal_normative_modeling_tpu.evaluation.metrics import (
        find_best_threshold_by_pr,
    )

    labels = [1, 1, 0, 1, 0, 0, 0, 0]
    scores = [0.4, 0.5, 0.9, 0.6, 0.1, 0.2, 0.15, 0.3]
    assert find_best_threshold_by_pr(labels, scores) == 0.4


def test_assert_modalities_aligned_raises_on_mismatch():
    import pandas as pd
    import pytest

    from multi_modal_normative_modeling_tpu.cli.common import (
        assert_modalities_aligned,
    )

    a = pd.DataFrame({"participant_id": ["s1", "s2", "s3"]})
    b = pd.DataFrame({"participant_id": ["s1", "s3"]})
    assert_modalities_aligned([a, a.copy()], "ctx")  # aligned: no raise
    with pytest.raises(ValueError, match="modality row sets"):
        assert_modalities_aligned([a, b], "ctx")


def test_ols_pvalues_handle_constant_latent_dim():
    """A posterior-collapsed (constant) latent dim must yield finite-or-NaN
    p-values, not LinAlgError (statsmodels OLS is pinv-based)."""
    import numpy as np

    from multi_modal_normative_modeling_tpu.infer.deviation import (
        latent_pvalues,
    )

    rng = np.random.default_rng(0)
    latent = np.column_stack([rng.normal(size=40),
                              np.full(40, 0.7)])  # dim 1 collapsed
    target = rng.normal(size=40)
    frame = latent_pvalues(latent, target, "continuous")
    assert frame.shape[0] == 2  # const/latent rows, no crash


def test_qcut_rank_one_hot_string_covariates_match_pandas():
    """Object-dtype covariates (string PTGENDER) must bin exactly like the
    reference's pd.qcut(values.rank(method='first'), q)."""
    import numpy as np
    import pandas as pd

    from multi_modal_normative_modeling_tpu.data.preprocess import (
        qcut_rank_one_hot,
    )

    values = pd.Series(["Male", "Female", "Female", "Male", "Male"])
    out = qcut_rank_one_hot(values, 2)
    oracle_bins = pd.qcut(values.rank(method="first"), q=2,
                          labels=[0, 1]).astype(int)
    np.testing.assert_array_equal(out, np.eye(2)[oracle_bins])


def test_fast_inner_merge_nan_keys_match_pandas():
    import numpy as np
    import pandas as pd

    from multi_modal_normative_modeling_tpu.data.loading import (
        fast_inner_merge,
    )

    left = pd.DataFrame({"IID": ["a", np.nan, "b"], "x": [1, 2, 3]})
    right = pd.DataFrame({"IID": ["b", np.nan, "a"], "y": [10, 20, 30]})
    got = fast_inner_merge(left, right, on="IID")
    want = pd.merge(left, right, on="IID")
    pd.testing.assert_frame_equal(got, want)


def test_train_cli_batch_size_flag(tmp_path):
    """--batch_size (round 4): the reference hardcodes 256; the opt-in
    trains end-to-end at other sizes and rejects nonsense."""
    import argparse

    import numpy as np
    import pytest

    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 15})
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="SE-MoE", combine="MoE", epochs=4, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=True, precision="fp32",
    )
    train_supervised.main(argparse.Namespace(**base, batch_size=16),
                          project_root=tmp_path)
    ckpt = (tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae"
            / "000" / "cVAE_model.ckpt")
    assert ckpt.exists()
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        load_checkpoint,
    )

    params, _ = load_checkpoint(ckpt.parent)
    assert np.isfinite(
        np.asarray(params["enc"]["0"]["hidden"]["0"]["w"])).all()
    with pytest.raises(SystemExit, match="batch_size"):
        train_supervised.main(argparse.Namespace(**base, batch_size=0),
                              project_root=tmp_path)


def test_resume_refuses_batch_size_mismatch(tmp_path):
    """A checkpointed run resumed under a DIFFERENT --batch_size is a
    different trajectory (batch grid changes the gradient sequence) and is
    refused by the fingerprint guard; default-256 states stay compatible
    with pre-round-4 builds (no 'batch' key when default)."""
    import jax
    import numpy as np
    import pytest

    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.train import (
        FoldTrainer,
        TrainConfig,
    )
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    model = build_model("cVAE_multimodal", [16, 12], [10, 8], 4, 3, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    data = [rng.normal(size=(40, d)).astype(np.float32) for d in (16, 12)]
    cov = [rng.normal(size=(40, 3)).astype(np.float32)] * 2
    key = jax.random.PRNGKey(9)

    cfg16 = TrainConfig(epochs=2, batch_size=16, combine="gpoe")
    FoldTrainer(model, cfg16, 40).run_resumable(
        params, data, cov, key, tmp_path, checkpoint_every=2)
    assert peek_train_meta(tmp_path)["batch"] == "16"

    cfg8 = TrainConfig(epochs=4, batch_size=8, combine="gpoe")
    with pytest.raises(ValueError, match="refusing to resume"):
        FoldTrainer(model, cfg8, 40).run_resumable(
            params, data, cov, key, tmp_path, checkpoint_every=2,
            resume=True)
    # default-256 meta carries NO batch key (older-build compatibility)
    d256 = tmp_path / "default"
    FoldTrainer(model, TrainConfig(epochs=2, batch_size=256,
                                   combine="gpoe"), 40).run_resumable(
        params, data, cov, key, d256, checkpoint_every=2)
    assert "batch" not in (peek_train_meta(d256) or {})
