"""One-process pipeline CLI (cli/pipeline.py): train -> test -> analyze in a
single launch, stage subsets, and parity of the produced artifacts with the
reference's three-launch chain layout."""
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import pipeline
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeproj")
    make_synthetic_resource(root, "ADNI", n_hc=60,
                            n_disease={0: 24, 1: 24}, effect=0.9)
    return root


def test_pipeline_full_chain(project):
    argv = ["-R", "ADNI", "-P", "SE-MoE", "-E", "15", "-K", "2",
            "-H", "16", "16", "4"]
    stats = pipeline.run(argv, project_root=project)
    # analysis stats for the first label pair come back from the last stage
    assert stats is not None and "auc" in stats
    assert np.isfinite(stats["auc"][0])
    # the three-launch chain's artifact layout
    assert (project / "outputs" / "kfold_analysis" / "supervised_cvae"
            / "000" / "cVAE_model.ckpt").exists()
    deviation = project / "deviation" / "supervised_cvae" / "ADNI"
    assert any(deviation.rglob("*.csv"))
    assert (project / "result_baseline" / "result_multimodal.txt").exists()


def test_pipeline_stage_subset_reuses_checkpoints(project):
    # re-run only test+analyze against the checkpoints from the full chain
    argv = ["-R", "ADNI", "-P", "SE-MoE", "-E", "15", "-K", "2",
            "-H", "16", "16", "4", "--stages", "analyze,test"]
    stats = pipeline.run(argv, project_root=project)
    assert stats is not None and np.isfinite(stats["auc"][0])


def test_pipeline_rejects_unknown_stage(project):
    argv = ["-R", "ADNI", "-P", "SE-MoE", "-K", "2", "-H", "16", "16", "4",
            "--stages", "train,deploy"]
    with pytest.raises(ValueError, match="deploy"):
        pipeline.run(argv, project_root=project)


def test_pipeline_warmup_only_skips_eval_stages(project, capsys):
    argv = ["-R", "ADNI", "-P", "SE-MoE", "-E", "5", "-K", "2",
            "-H", "16", "16", "4", "--warmup_only"]
    stats = pipeline.run(argv, project_root=project)
    assert stats is None  # test/analyze skipped: no stale-checkpoint eval
    out = capsys.readouterr().out
    assert "skipping the test/analyze stages" in out
