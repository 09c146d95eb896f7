"""AOT model export (cli/export.py): a trained fold-ensemble serialized as
a portable StableHLO artifact must reproduce the serving daemon's scoring
(same scalers, covariate binning, PRNG streams) with a shape-polymorphic
batch dimension, from the artifact alone."""
import argparse

import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.cli import export, serve, train_supervised
from multi_modal_normative_modeling_tpu.data.preprocess import (
    apply_binned_covariate_spec,
    binned_covariate_graph_spec,
    train_binned_covariates,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


# --------------------------------------------------------- in-graph binning
def _cov(age, gender):
    return pd.DataFrame({"AGE": age, "PTGENDER": gender})


@pytest.mark.parametrize("n_train", [12, 200])
def test_graph_binning_matches_host_path(n_train):
    """apply_binned_covariate_spec must reproduce train_binned_covariates
    on numeric cohorts through BOTH branches: nearest-train-value
    (<= q distinct values: always PTGENDER; AGE when n_train=12) and
    quantile edges (AGE when 200 draws exceed 27 uniques)."""
    rng = np.random.RandomState(3)
    train = _cov(rng.uniform(55, 95, n_train).round(1),
                 rng.choice([1, 2], n_train))
    new = _cov(rng.uniform(50, 99, 37).round(1), rng.choice([1, 2], 37))

    expected = train_binned_covariates(train, new)
    spec = binned_covariate_graph_spec(train)
    got = np.asarray(apply_binned_covariate_spec(
        spec, new["AGE"].to_numpy(np.float32),
        new["PTGENDER"].to_numpy(np.float32)))
    modes = {e["col"]: e["mode"] for e in spec}
    assert modes["PTGENDER"] == "nearest"
    assert modes["AGE"] == ("nearest" if n_train == 12 else "quantile")
    np.testing.assert_array_equal(got, expected)


def test_quantile_edges_exact_for_float32_inputs():
    """Float64 quantile edges are rarely float32-representable; the spec
    rounds each edge UP to float32 so that for every float32-representable
    input the in-graph searchsorted bins exactly like the float64 host
    path — including subjects sitting one float32 ulp on either side of
    every edge (the worst case for round-to-nearest)."""
    rng = np.random.RandomState(7)
    train = _cov(rng.uniform(55.0, 95.0, 500), rng.choice([1, 2], 500))
    spec = binned_covariate_graph_spec(train)
    age_entry = next(e for e in spec if e["col"] == "AGE")
    assert age_entry["mode"] == "quantile"

    edges64 = np.quantile(np.asarray(train["AGE"], np.float64),
                          np.linspace(0.0, 1.0, 28)[1:-1])
    assert (np.float32(edges64) != edges64).any()  # worst case is exercised
    # float32 neighbors straddling every edge
    hi = np.asarray(age_entry["values"], np.float32)
    lo = np.nextafter(hi, np.float32(-np.inf))
    probes = np.concatenate([hi, lo])
    gender = np.ones(len(probes), np.float32)

    expected = train_binned_covariates(train, _cov(probes, gender))
    got = np.asarray(apply_binned_covariate_spec(spec, probes, gender))
    np.testing.assert_array_equal(got, expected)


def test_categorical_covariates_not_exportable():
    train = _cov([60, 61, 62], ["Male", "Female", "Male"])
    with pytest.raises(ValueError, match="categorical"):
        binned_covariate_graph_spec(train)


# ------------------------------------------------------------ the artifact
@pytest.fixture(scope="module")
def trained_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_project")
    make_synthetic_resource(root, "ADNI", n_hc=60, n_disease={0: 30},
                            effect=1.2)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=30, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=root)
    return root


@pytest.fixture(scope="module")
def artifact(trained_project, tmp_path_factory):
    out = tmp_path_factory.mktemp("artifact") / "model.mmnm"
    meta = export.run(["-R", "ADNI", "-P", "SM-av45", "-C", "PoE",
                       "-K", "2", "-o", str(out)],
                      project_root=trained_project)
    return out, meta


@pytest.fixture(scope="module")
def scorer(artifact):
    return export.load_scorer(artifact[0])


@pytest.fixture(scope="module")
def service(trained_project):
    return serve.ScoringService("ADNI", "SM-av45", combine="PoE",
                                n_splits=2, project_root=trained_project)


def test_artifact_meta(artifact):
    _, meta = artifact
    assert meta["format"] == export.FORMAT
    assert meta["modalities"] == ["av45"]
    assert meta["feature_dims"] == [90]
    assert meta["n_folds"] == 2
    assert set(meta["platforms"]) == {"cpu", "tpu"}
    assert meta["covariates"] == ["AGE", "PTGENDER"]
    assert meta["has_latent"] is True
    assert len(meta["outputs"]) == 4


def test_exported_scoring_matches_serve(scorer, service):
    """The deserialized program (binning + scaling + inference on device,
    constants baked in) must reproduce the daemon's raw-payload scoring."""
    ids = list(service._frames[0].index[:9])
    rows = service._frames[0].loc[ids]
    features = {"av45": rows[service.columns[0]].to_numpy(np.float32)}
    covariates = {"AGE": rows["AGE"].tolist(),
                  "PTGENDER": rows["PTGENDER"].tolist()}

    expected = service.score_raw(features, covariates, roi=True)
    got = scorer.score(features, covariates, roi=True)

    np.testing.assert_allclose(got["deviation"], expected["deviation"],
                               rtol=1e-5)
    np.testing.assert_allclose(got["per_modality"]["av45"],
                               expected["per_modality"]["av45"], rtol=1e-5)
    np.testing.assert_allclose(got["roi"], expected["roi"], rtol=1e-4,
                               atol=1e-6)
    assert got["roi_columns"] == expected["roi_columns"]
    assert got["n_folds"] == expected["n_folds"] == 2

    # single-fold selection agrees too
    for fold in range(2):
        np.testing.assert_allclose(
            scorer.score(features, covariates, fold=fold)["deviation"],
            service.score_raw(features, covariates, fold=fold)["deviation"],
            rtol=1e-5)


def test_exported_latent_matches_serve(scorer, service):
    """The artifact's baked-in train-latent statistics must reproduce the
    daemon's latent z-scoring (deterministic: no PRNG involved)."""
    rows = service._frames[0].loc[list(service._frames[0].index[:8])]
    features = {"av45": rows[service.columns[0]].to_numpy(np.float32)}
    covariates = {"AGE": rows["AGE"].tolist(),
                  "PTGENDER": rows["PTGENDER"].tolist()}

    expected = service.score_raw(features, covariates, latent=True)
    got = scorer.score(features, covariates, latent=True)
    np.testing.assert_allclose(got["latent_deviation"],
                               expected["latent_deviation"], rtol=1e-5)
    np.testing.assert_allclose(got["latent_per_dim"],
                               expected["latent_per_dim"],
                               rtol=1e-4, atol=1e-6)

    # a latent-less artifact refuses latent requests with a clear error
    scorer.meta = dict(scorer.meta, has_latent=False)
    try:
        with pytest.raises(ValueError, match="without latent"):
            scorer.score(features, covariates, latent=True)
    finally:
        scorer.meta["has_latent"] = True


def test_batch_dimension_is_polymorphic(scorer, service):
    """One artifact serves any batch size, and a subject's score does not
    depend on who else is in the batch (per-row PRNG invariance)."""
    rows = service._frames[0].loc[list(service._frames[0].index[:11])]
    feats = rows[service.columns[0]].to_numpy(np.float32)
    age = rows["AGE"].to_numpy(np.float32)
    gender = rows["PTGENDER"].to_numpy(np.float32)

    full = scorer.score({"av45": feats},
                        {"AGE": age, "PTGENDER": gender})
    head = scorer.score({"av45": feats[:3]},
                        {"AGE": age[:3], "PTGENDER": gender[:3]})
    assert len(full["deviation"]) == 11 and len(head["deviation"]) == 3
    np.testing.assert_allclose(head["deviation"], full["deviation"][:3],
                               rtol=1e-6)


def test_loader_validation(scorer):
    ok_cov = {"AGE": [70.0], "PTGENDER": [1.0]}
    with pytest.raises(ValueError, match="expected \\[n_subjects, 90\\]"):
        scorer.score({"av45": [[1.0, 2.0]]}, ok_cov)
    with pytest.raises(ValueError, match="missing features"):
        scorer.score({"wrong": np.zeros((1, 90))}, ok_cov)
    with pytest.raises(ValueError, match="covariate PTGENDER"):
        scorer.score({"av45": np.zeros((2, 90), np.float32)},
                     {"AGE": [70.0, 71.0], "PTGENDER": [1.0]})
    with pytest.raises(ValueError, match="fold"):
        scorer.score({"av45": np.zeros((1, 90), np.float32)}, ok_cov, fold=5)


def test_artifact_is_self_contained(artifact, scorer, service, tmp_path):
    """A fresh process that imports ONLY jax + stdlib (none of this
    package's model/data code) can deserialize the artifact and score —
    the pickle-requires-the-source-tree failure mode of the reference's
    torch checkpoints cannot happen."""
    import json
    import os
    import subprocess
    import sys

    path, _ = artifact
    rows = service._frames[0].loc[list(service._frames[0].index[:4])]
    feats = rows[service.columns[0]].to_numpy(np.float32)
    np.save(tmp_path / "x.npy", feats)
    np.save(tmp_path / "age.npy", rows["AGE"].to_numpy(np.float32))
    np.save(tmp_path / "gender.npy", rows["PTGENDER"].to_numpy(np.float32))

    script = f"""
import json, zipfile
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport

with zipfile.ZipFile({str(path)!r}) as z:
    meta = json.loads(z.read("meta.json"))
    program = jexport.deserialize(z.read("scoring.stablehlo"))
x = np.load({str(tmp_path / 'x.npy')!r})
age = np.load({str(tmp_path / 'age.npy')!r})
gender = np.load({str(tmp_path / 'gender.npy')!r})
devs, roi, *latent = program.call(x, age, gender)
assert len(latent) == (2 if meta["has_latent"] else 0)
print(json.dumps(np.asarray(devs).mean(axis=(0, 1)).tolist()))
"""
    env = {k: v for k, v in os.environ.items()}
    out = subprocess.run([sys.executable, "-c", script], env=env, text=True,
                         capture_output=True, timeout=300, cwd=tmp_path)
    assert out.returncode == 0, out.stdout + out.stderr
    standalone = json.loads(out.stdout.strip().splitlines()[-1])
    expected = scorer.score(
        {"av45": feats},
        {"AGE": rows["AGE"].tolist(), "PTGENDER": rows["PTGENDER"].tolist()})
    np.testing.assert_allclose(standalone, expected["deviation"], rtol=1e-6)


def test_load_ensemble_rejects_misaligned_modalities(tmp_path):
    """A modality CSV missing a train subject must fail ensemble load
    loudly (the per-fold covariates and latent statistics pair modality-0
    rows with the last modality's frame) instead of silently skewing every
    serve/export score."""
    from multi_modal_normative_modeling_tpu.infer.ensemble import (
        load_ensemble,
    )

    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 10},
                            effect=1.2)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SE-MoE", combine="MoE", epochs=2, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=tmp_path)
    load_ensemble("ADNI", "SE-MoE", combine="MoE", n_splits=2,
                  project_root=tmp_path)  # aligned: loads fine

    # drop a subject that IS in fold 0's train cohort from one modality
    vbm = tmp_path / "data" / "ADNI" / "vbm.csv"
    victim = pd.read_csv(
        tmp_path / "outputs" / "kfold_analysis" / "train_ids_000.csv"
    ).iloc[0, 0]
    frame = pd.read_csv(vbm)
    frame[frame["IID"] != victim].to_csv(vbm, index=False)
    with pytest.raises(ValueError, match="same subjects in the same order"):
        load_ensemble("ADNI", "SE-MoE", combine="MoE", n_splits=2,
                      project_root=tmp_path)


def test_format_guard(tmp_path):
    import json
    import zipfile

    bogus = tmp_path / "bogus.mmnm"
    with zipfile.ZipFile(bogus, "w") as z:
        z.writestr(export.META_MEMBER, json.dumps({"format": "other/9"}))
        z.writestr(export.PROGRAM_MEMBER, b"")
    with pytest.raises(ValueError, match="unsupported artifact format"):
        export.load_scorer(bogus)
