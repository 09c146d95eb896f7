"""Data layer: registries, k-fold id generation, preprocessing, compat shims."""
import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu import registry
from multi_modal_normative_modeling_tpu.data.loading import (
    cliff_delta,
    generate_kfold_ids,
    load_dataset,
)
from multi_modal_normative_modeling_tpu.data.preprocess import (
    fit_robust_scaler,
    one_hot_covariates,
    qcut_rank_one_hot,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def test_registry_column_counts():
    assert len(registry.COLUMNS_NAME) == 90
    assert len(registry.COLUMNS_NAME_VBM) == 90
    assert len(registry.COLUMNS_NAME_SNP) == 54
    assert len(registry.COLUMNS_NAME_AAL116) == 116
    assert len(registry.COLUMNS_HCP) == 132
    assert len(registry.COLUMNS_NAME_PPMI) == 3485
    assert len(registry.COLUMNS_3MODALITIES) == 270
    # early-fusion order: av45 block, fdg block, vbm block (verified equal to
    # the reference literal)
    assert registry.COLUMNS_3MODALITIES[0] == "Precentral_L_av45"
    assert registry.COLUMNS_3MODALITIES[90] == "Precentral_L_fdg"
    assert registry.COLUMNS_3MODALITIES[180] == "MNI_Amygdala_L_vbm"


def test_procedure_grammar():
    assert registry.get_datasets_name("ADNI", "SM-av45") == ["av45"]
    assert registry.get_datasets_name("ADNI", "SE-PoE") == ["av45", "vbm", "fdg"]
    assert registry.get_datasets_name("ADNI", "UCA-gPoE") == [
        "av45", "vbm", "fdg", "early_fusion_modalities_ADNI"
    ]
    assert len(registry.get_datasets_name("HCP", "SE-MoE")) == 12
    with pytest.raises(ValueError):
        registry.get_datasets_name("NOPE", "SE-PoE")


def test_early_fusion_columns_are_suffixed():
    cols = registry.get_column_name("ADNI", "early_fusion_modalities_ADNI")
    assert len(cols) == 270
    assert cols[0].endswith("_av45")
    assert cols[-1].endswith("_fdg")


def test_hc_labels():
    assert registry.get_hc_label("ADNI") == 2
    assert registry.get_hc_label("ADHD") == 1
    with pytest.raises(ValueError):
        registry.get_hc_label("NOPE")


def test_cliff_delta_matches_loop_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=37)
    y = rng.normal(size=23) + 0.5
    # O(n^2) loop reference (utils.py:97-109)
    mat = np.zeros((37, 23))
    for i in range(37):
        for j in range(23):
            if x[i] > y[j]:
                mat[i, j] = 1
            elif y[j] > x[i]:
                mat[i, j] = -1
    expected = mat.sum() / (37 * 23)
    np.testing.assert_allclose(cliff_delta(x, y), expected)
    np.testing.assert_allclose(cliff_delta(x, y, chunk=8), expected)


def test_generate_kfold_ids_layout(tmp_path):
    np.random.seed(42)
    hc = pd.DataFrame({"IID": [f"h{i}" for i in range(20)]})
    other = pd.DataFrame({"IID": [f"d{i}" for i in range(10)]})
    generate_kfold_ids(hc, other, oversample_percentage=1, n_splits=3,
                       project_root=tmp_path)
    kdir = tmp_path / "outputs" / "kfold_analysis"
    train = pd.read_csv(kdir / "train_ids_000.csv")
    test = pd.read_csv(kdir / "test_ids_000.csv")
    assert list(train.columns) == ["IID"]
    assert list(test.columns) == ["IID"]
    assert len(train) == 20  # oversampled to int(len * 1.0)
    # folds partition the concatenated cohort
    all_test = pd.concat([
        pd.read_csv(kdir / f"test_ids_{f:03d}.csv") for f in range(3)
    ])
    assert sorted(all_test["IID"]) == sorted(list(hc["IID"]) + list(other["IID"]))


def test_qcut_one_hot_matches_pandas_semantics():
    ages = pd.Series([70, 60, 65, 80, 75, 62, 68, 71, 73, 77])
    one_hot = qcut_rank_one_hot(ages, 5)
    assert one_hot.shape == (10, 5)
    assert (one_hot.sum(axis=0) == 2).all()  # rank-based: perfectly balanced
    # the two oldest land in the last bin
    assert one_hot[3, 4] == 1 and one_hot[9, 4] == 1


def test_one_hot_covariates_dims():
    frame = pd.DataFrame({
        "DIA": [1] * 30,
        "AGE": np.arange(30) + 50,
        "PTGENDER": [1, 2] * 15,
    })
    cov = one_hot_covariates(frame)
    assert cov.shape == (30, 29)
    assert cov.dtype == np.float32
    assert (cov.sum(axis=1) == 2).all()


def test_robust_scaler_params_match_sklearn():
    from sklearn.preprocessing import RobustScaler

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 7)) * 3 + 1
    scaled, params = fit_robust_scaler(x)
    ref = RobustScaler().fit_transform(x)
    np.testing.assert_allclose(scaled, ref)
    np.testing.assert_allclose(params.transform(x), ref)
    np.testing.assert_allclose(params.inverse_transform(ref), x, rtol=1e-10)


def test_fast_robust_scaler_matches_sklearn_bitwise():
    """The vectorized NaN-free fast path must be BIT-identical to sklearn's
    per-column nanpercentile loop — including constant and near-constant
    columns (_handle_zeros_in_scale) and odd/even row counts."""
    from sklearn.preprocessing import RobustScaler

    rng = np.random.default_rng(7)
    for n in (9, 10, 257, 700):
        x = rng.normal(size=(n, 11)) * rng.lognormal(size=11)
        x[:, 3] = 5.0                      # constant column -> scale 1.0
        x[:, 5] = 1e-300                   # tiny constant
        x[:, 7] = np.round(x[:, 7])        # heavy ties
        scaled, params = fit_robust_scaler(x)
        sk = RobustScaler()
        ref = sk.fit_transform(x)
        np.testing.assert_array_equal(params.center, sk.center_)
        np.testing.assert_array_equal(params.scale, sk.scale_)
        np.testing.assert_array_equal(scaled, ref)
    # NaN input falls back to sklearn
    x = rng.normal(size=(20, 3))
    x[2, 1] = np.nan
    scaled, params = fit_robust_scaler(x)
    sk = RobustScaler()
    np.testing.assert_array_equal(scaled, sk.fit_transform(x))


def test_qcut_rank_one_hot_matches_pandas():
    """The argsort + cached-code-table fast path must be bit-identical to
    pd.qcut(values.rank(method='first'), q) — including ties (first-appearance
    order) and every q the pipelines use."""
    rng = np.random.default_rng(11)
    for n, q in ((30, 27), (701, 27), (64, 2), (64, 27), (10, 5)):
        for vals in (
            rng.normal(size=n),
            np.round(rng.normal(size=n)),            # many ties
            np.repeat(rng.normal(size=max(1, n // 4)), 4)[:n],  # tie blocks
        ):
            series = pd.Series(vals)
            ref_bins = pd.qcut(series.rank(method="first"), q=q,
                               labels=list(range(q)))
            ref = np.eye(q)[np.asarray(ref_bins, dtype=int)]
            np.testing.assert_array_equal(qcut_rank_one_hot(series, q), ref)


def test_fast_inner_merge_matches_pandas():
    """The numpy row-map merge must equal pd.merge frame-for-frame in both
    pipeline cases (unique-right: ids x demographic; unique-left:
    modality x duplicated-demographic) and fall back cleanly otherwise."""
    from multi_modal_normative_modeling_tpu.data.loading import (
        fast_inner_merge,
    )

    rng = np.random.default_rng(5)
    iids = [f"s{i:03d}" for i in range(40)]
    demo = pd.DataFrame({
        "IID": iids,
        "DIA": rng.integers(0, 3, size=40),
        "AGE": rng.integers(55, 90, size=40).astype(float),
        "PTGENDER": rng.integers(1, 3, size=40),
    })
    # oversampled-with-replacement fold ids, some missing from demo
    ids = pd.DataFrame({
        "IID": list(rng.choice(iids[:30], size=50, replace=True)) + ["ghost"]
    })
    ids["participant_id"] = ids["IID"]

    # unique-right path
    merged = fast_inner_merge(ids, demo, on="IID")
    pd.testing.assert_frame_equal(merged, pd.merge(ids, demo, on="IID"))

    # unique-left path: modality x (ids x demo) with duplicated IIDs
    modality = pd.DataFrame(rng.normal(size=(40, 5)),
                            columns=[f"roi{i}" for i in range(5)])
    modality.insert(2, "IID", list(reversed(iids)))  # key mid-frame
    out = fast_inner_merge(modality, merged, on="IID")
    ref = pd.merge(modality, merged, on="IID")
    pd.testing.assert_frame_equal(out, ref)
    assert list(out.columns)[:3] == ["roi0", "roi1", "IID"]

    # shared non-key column -> pandas fallback (suffix semantics)
    demo2 = demo.copy()
    demo2["roi0"] = 0.0
    pd.testing.assert_frame_equal(fast_inner_merge(modality, demo2, on="IID"),
                                  pd.merge(modality, demo2, on="IID"))

    # neither side unique -> pandas fallback (M:N cartesian semantics)
    left_dup = pd.DataFrame({"IID": ["a", "a", "b"], "x": [1, 2, 3]})
    right_dup = pd.DataFrame({"IID": ["a", "b", "a"], "y": [10, 20, 30]})
    pd.testing.assert_frame_equal(
        fast_inner_merge(left_dup, right_dup, on="IID"),
        pd.merge(left_dup, right_dup, on="IID"))


def test_load_dataset_row_order_follows_modality_csv(tmp_path):
    data_dir = make_synthetic_resource(tmp_path, "ADNI", n_hc=10,
                                       n_disease={0: 5})
    ids = pd.DataFrame({"IID": pd.read_csv(data_dir / "y.csv")["IID"][:8]})
    ids_path = tmp_path / "ids.csv"
    ids.to_csv(ids_path, index=False)
    df = load_dataset(data_dir / "y.csv", ids_path, data_dir / "av45.csv")
    # modality CSV is the left side of the merge: row order follows it
    assert list(df["IID"]) == list(ids["IID"])
    assert "participant_id" in df.columns


def test_compat_shims():
    import utils
    import utils_vae

    assert utils.get_hc_label("ADNI") == 2
    assert len(utils.COLUMNS_3MODALITIES) == 270
    assert len(utils.COLUMNS_NAME_HCP_fMRI_100) == 100

    data = np.random.randn(5, 3).astype(np.float64)
    labels = np.array([0, 1, 0, 1, 1])
    ds = utils_vae.MyDataset_labels(data, labels)
    x, t = ds[2]
    assert x.dtype == np.float32 and t == 0
    assert len(ds) == 5

    dev = utils_vae.reconstruction_deviation(data, data * 0.5)
    np.testing.assert_allclose(dev, np.sum((data * 0.5) ** 2, axis=1) / 3)


def test_latent_pvalues_ols_and_logit():
    from multi_modal_normative_modeling_tpu.infer.deviation import (
        latent_pvalues,
    )

    rng = np.random.default_rng(0)
    latent = rng.normal(size=(80, 3))
    continuous = 2.0 * latent[:, 0] + rng.normal(scale=0.1, size=80)
    frame = latent_pvalues(latent, continuous, "continuous")
    assert list(frame["labels"]) == ["const", "latent"]
    assert frame.shape == (2, 4)
    # dim 0 strongly predicts the target; dims 1-2 don't
    assert frame["latent 0"][1] < 1e-6
    assert frame["latent 1"][1] > 1e-3

    binary = (latent[:, 1] > 0).astype(int)
    frame2 = latent_pvalues(latent, binary, "binary")
    assert frame2.shape == (2, 4)


def test_generate_kfold_ids_unigroup_hc_only_training(tmp_path):
    """Unigroup split: train folds draw from HC only; every patient joins
    every test fold (reference utils.py:50-70 — used by nm-MLP/nm-PM-cont)."""
    from multi_modal_normative_modeling_tpu.data.loading import (
        generate_kfold_ids_with_unigroup,
    )

    np.random.seed(42)
    hc = pd.DataFrame({"IID": [f"h{i}" for i in range(20)]})
    other = pd.DataFrame({"IID": [f"d{i}" for i in range(10)]})
    generate_kfold_ids_with_unigroup(hc, other, oversample_percentage=1,
                                     n_splits=3, project_root=tmp_path)
    kdir = tmp_path / "outputs" / "kfold_analysis"
    for fold in range(3):
        train = pd.read_csv(kdir / f"train_ids_{fold:03d}.csv")
        test = pd.read_csv(kdir / f"test_ids_{fold:03d}.csv")
        assert all(iid.startswith("h") for iid in train["IID"])
        assert set(other["IID"]).issubset(set(test["IID"]))
    # HC test rows still partition the HC cohort across folds
    hc_test = pd.concat([
        pd.read_csv(kdir / f"test_ids_{f:03d}.csv") for f in range(3)
    ])
    hc_only = hc_test[hc_test["IID"].str.startswith("h")]
    assert sorted(hc_only["IID"]) == sorted(hc["IID"])


def test_generate_kfold_ids_endtoend_dir_and_determinism(tmp_path):
    """End-to-end variant writes to kfold_analysis_endtoend with the same
    seed-42 KFold split as the supervised generator (utils.py:19-42)."""
    from multi_modal_normative_modeling_tpu.data.loading import (
        generate_kfold_ids,
        generate_kfold_ids_endtoend,
    )

    hc = pd.DataFrame({"IID": [f"h{i}" for i in range(20)]})
    other = pd.DataFrame({"IID": [f"d{i}" for i in range(10)]})
    np.random.seed(42)
    generate_kfold_ids(hc, other, n_splits=3, project_root=tmp_path)
    np.random.seed(42)
    generate_kfold_ids_endtoend(hc, other, n_splits=3, project_root=tmp_path)
    for fold in range(3):
        a = pd.read_csv(tmp_path / "outputs" / "kfold_analysis" /
                        f"test_ids_{fold:03d}.csv")
        b = pd.read_csv(tmp_path / "outputs" / "kfold_analysis_endtoend" /
                        f"test_ids_{fold:03d}.csv")
        pd.testing.assert_frame_equal(a, b)


def test_train_binned_covariates_string_gender():
    """Serving-path binning accepts categorical (string) PTGENDER, matching
    the numeric-coded cohort bin-for-bin (review fix: the score CLI crashed
    on string-gender cohorts the k-fold path already accepted)."""
    from multi_modal_normative_modeling_tpu.data.preprocess import (
        train_binned_covariates,
    )

    rng = np.random.default_rng(0)
    age = rng.uniform(55, 90, size=60)
    gender_num = rng.integers(1, 3, size=60)
    # 'Female' < 'Male' lexicographically, like 1 < 2 numerically
    gender_str = np.where(gender_num == 1, 'Female', 'Male')
    train_num = pd.DataFrame({'AGE': age, 'PTGENDER': gender_num})
    train_str = pd.DataFrame({'AGE': age, 'PTGENDER': gender_str})

    new_num = train_num.iloc[:10]
    new_str = train_str.iloc[:10]
    out_num = train_binned_covariates(train_num, new_num)
    out_str = train_binned_covariates(train_str, new_str)
    assert out_str.shape == out_num.shape
    np.testing.assert_array_equal(out_str, out_num)

    # single-subject scoring works (the motivating serving case)
    one = train_binned_covariates(train_str, new_str.iloc[:1])
    assert one.shape == (1, out_num.shape[1])


def test_require_test_cov_raises_with_reason():
    """k-fold consumers fail loudly (with the original qcut reason) when
    prepare_modality could not bin a tiny test split, instead of crashing
    on the None far downstream."""
    from multi_modal_normative_modeling_tpu.cli.common import require_test_cov

    prep = {'test_cov': None, 'test_cov_error': 'Bin edges must be unique'}
    with pytest.raises(ValueError, match='Bin edges must be unique'):
        require_test_cov(prep, 'test fold 0')
    with pytest.raises(ValueError, match='cli.score'):
        require_test_cov({'test_cov': None}, 'test fold 0')

    cov = np.ones((4, 3), np.float32)
    assert require_test_cov({'test_cov': cov}, 'ctx') is cov


def test_train_binned_covariates_imbalanced_numeric_gender():
    """A majority-low numeric-coded binary gender must keep both bins: the
    old quantile-edge path put BOTH genders in one bin whenever the lower
    code was the train majority (median edge + side='right')."""
    from multi_modal_normative_modeling_tpu.data.preprocess import (
        train_binned_covariates,
    )

    train = pd.DataFrame({'AGE': np.linspace(60, 80, 60),
                          'PTGENDER': [1] * 36 + [2] * 24})
    new = pd.DataFrame({'AGE': [70.0, 70.0], 'PTGENDER': [1, 2]})
    out = train_binned_covariates(train, new)
    g = out[:, -2:]  # trailing 2 gender columns
    np.testing.assert_array_equal(g, [[1, 0], [0, 1]])

    # unseen numeric values map to the NEAREST train value's bin (tiny
    # cohorts where AGE has <= q distinct values must accept new ages);
    # unseen STRING categories still raise (strict identity path)
    near = train_binned_covariates(
        train, pd.DataFrame({'AGE': [70.0], 'PTGENDER': [3]}))
    np.testing.assert_array_equal(near[:, -2:], [[0, 1]])

    # more train categories than bins cannot be encoded faithfully
    train3 = pd.DataFrame({'AGE': np.linspace(60, 80, 60),
                           'PTGENDER': ['F', 'M', 'X'] * 20})
    with pytest.raises(ValueError, match='exceed'):
        train_binned_covariates(train3, train3.iloc[:2])


def test_load_demographic_data_existing_participant_id():
    """A y.csv that already carries participant_id must not collide with
    the synthesized column (suffixed _x/_y would break every consumer)."""
    import tempfile
    from pathlib import Path

    from multi_modal_normative_modeling_tpu.data.loading import (
        load_demographic_data,
    )

    with tempfile.TemporaryDirectory() as d:
        d = Path(d)
        pd.DataFrame({
            'IID': ['a', 'b', 'c'], 'participant_id': ['pa', 'pb', 'pc'],
            'DIA': [2, 2, 0], 'AGE': [70, 71, 72], 'PTGENDER': [1, 2, 1],
        }).to_csv(d / 'y.csv', index=False)
        pd.DataFrame({'IID': ['a', 'c']}).to_csv(d / 'ids.csv', index=False)
        out = load_demographic_data(d / 'y.csv', d / 'ids.csv')
        assert list(out['participant_id']) == ['pa', 'pc']
        assert not any(c.endswith(('_x', '_y')) for c in out.columns)

        # the cached CLI loader takes the same plain-IID branch and must
        # apply the same guard
        from multi_modal_normative_modeling_tpu.cli.common import (
            load_dataset_cached,
        )

        feats = pd.DataFrame({'IID': ['a', 'b', 'c'],
                              'f1': [0.1, 0.2, 0.3]})
        feats.to_csv(d / 'mod.csv', index=False)
        merged = load_dataset_cached(d / 'y.csv', d / 'ids.csv',
                                     d / 'mod.csv')
        assert list(merged['participant_id']) == ['pa', 'pc']
        assert not any(c.endswith(('_x', '_y')) for c in merged.columns)
