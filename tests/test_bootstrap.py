"""Bootstrap pipeline (cli/bootstrap.py — the reference commands_list10.sh's
never-committed bootstrap_*.py chain, implemented for real)."""
import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.cli import bootstrap
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def _args(action, **over):
    base = ['-R', 'ADNI', '-D', '3modalities', '-E', '6', '-B', '3',
            '-H', '12', '12', '4']
    ns = bootstrap.build_parser().parse_args([action] + base)
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_bootstrap_ids_properties(tmp_path):
    make_synthetic_resource(tmp_path, 'ADNI', n_hc=50, n_disease={0: 20})
    bootstrap.create_ids(_args('create_ids'), project_root=tmp_path)

    y = pd.read_csv(tmp_path / 'data' / 'ADNI' / 'y.csv')
    hc_ids = set(y[y['DIA'] == 2]['IID'])
    other_ids = set(y[y['DIA'] != 2]['IID'])
    boot_dir = tmp_path / 'outputs' / 'bootstrap_analysis'

    trains = []
    for b in range(3):
        train = pd.read_csv(boot_dir / f'train_ids_{b:03d}.csv')['IID']
        test = pd.read_csv(boot_dir / f'test_ids_{b:03d}.csv')['IID']
        # with-replacement draw of exactly n training-class ids
        assert len(train) == len(hc_ids)
        assert set(train) <= hc_ids
        assert len(set(train)) < len(train)  # replacement ⇒ duplicates (whp)
        # test = OOB training-class + every other-group subject, disjoint
        # from the drawn set on the training-class side
        assert other_ids <= set(test)
        oob = set(test) - other_ids
        assert oob == hc_ids - set(train)
        trains.append(tuple(train))
    assert len(set(trains)) == 3  # replicates are distinct draws


@pytest.mark.slow
def test_bootstrap_end_to_end_and_vae_variant(tmp_path):
    make_synthetic_resource(tmp_path, 'ADNI', n_hc=50, n_disease={0: 20},
                            effect=1.2)
    bootstrap.main(_args('all'), project_root=tmp_path)

    model_dir = tmp_path / 'outputs' / 'bootstrap_analysis' / 'supervised_cvae'
    for b in range(3):
        rep = model_dir / f'{b:03d}'
        assert (rep / 'cVAE_model.ckpt').exists()
        assert (rep / 'cVAE_model.json').exists()
        dev = pd.read_csv(rep / 'deviation_3modalities.csv')
        assert list(dev.columns) == ['participant_id', 'DIA', 'AGE',
                                     'PTGENDER', 'Reconstruction deviation']
        assert np.isfinite(dev['Reconstruction deviation']).all()

    report = (tmp_path / 'result_baseline' / 'result_bootstrap.txt')
    assert 'Bootstrap settings: CVAE.' in report.read_text()
    aucs = pd.read_csv(tmp_path / 'bootstrap_auc.csv')
    assert set(aucs['pair']) == {'2vs0'}
    assert len(aucs) == 3
    # injected disease effect must be detectable out-of-bag
    assert aucs['auc'].mean() > 0.6

    # unconditioned (plain-VAE) variant: separate model dir, c_dim == 1
    bootstrap.main(_args('all', unconditioned=True), project_root=tmp_path)
    vae_dir = tmp_path / 'outputs' / 'bootstrap_analysis' / 'supervised_vae'
    import json

    config = json.loads((vae_dir / '000' / 'cVAE_model.json').read_text())
    assert config['c_dim'] == 1 and config['unconditioned'] is True
    assert 'Bootstrap settings: VAE.' in report.read_text()


def test_bootstrap_train_mesh_matches_unsharded(tmp_path):
    """--mesh R,D shards the replicate-parallel train program; results match
    the single-device run (identical synthetic cohorts + seeded draws in two
    project roots)."""
    import jax

    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        load_checkpoint,
    )

    roots = []
    for sub in ('plain', 'meshed'):
        root = tmp_path / sub
        make_synthetic_resource(root, 'ADNI', n_hc=40, n_disease={0: 10},
                                effect=1.2)
        bootstrap.create_ids(_args('create_ids', n_bootstrap=4),
                             project_root=root)
        roots.append(root)

    bootstrap.train(_args('train', n_bootstrap=4), project_root=roots[0])
    bootstrap.train(_args('train', n_bootstrap=4, mesh='4,2'),
                    project_root=roots[1])

    for b in range(4):
        rel = f'outputs/bootstrap_analysis/supervised_cvae/{b:03d}'
        plain, _ = load_checkpoint(roots[0] / rel)
        meshed, _ = load_checkpoint(roots[1] / rel)
        jax.tree_util.tree_map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-4),
            plain, meshed)

    # the test stage's scoring program shards the same way (replicates over
    # 'fold', padded rows over 'data'); scores must match the unmeshed run
    bootstrap.test(_args('test', n_bootstrap=4), project_root=roots[0])
    bootstrap.test(_args('test', n_bootstrap=4, mesh='4,2'),
                   project_root=roots[1])
    for b in range(4):
        rel = (f'outputs/bootstrap_analysis/supervised_cvae/{b:03d}/'
               'deviation_3modalities.csv')
        plain_dev = pd.read_csv(roots[0] / rel)
        meshed_dev = pd.read_csv(roots[1] / rel)
        np.testing.assert_allclose(
            meshed_dev['Reconstruction deviation'].values,
            plain_dev['Reconstruction deviation'].values,
            rtol=2e-2, atol=2e-4)


def test_bootstrap_analyze_attribution_with_skipped_replicate(tmp_path):
    """A replicate whose pair subset has one class is skipped WITHOUT
    shifting the surviving AUCs onto the wrong replicate ids."""
    boot_dir = tmp_path / 'outputs' / 'bootstrap_analysis'
    model_dir = boot_dir / 'supervised_cvae'
    rng = np.random.default_rng(0)
    for b in range(3):
        pd.DataFrame({'IID': [f's{i}' for i in range(5)]}).to_csv(
            boot_dir.mkdir(parents=True, exist_ok=True) or
            boot_dir / f'train_ids_{b:03d}.csv', index=False)
        rep = model_dir / f'{b:03d}'
        rep.mkdir(parents=True, exist_ok=True)
        if b == 1:  # single-class replicate: must be skipped
            dia = [2] * 6
        else:
            dia = [2, 2, 2, 0, 0, 0]
        dev = (np.where(np.asarray(dia) == 0, 5.0, 1.0)
               + rng.normal(scale=0.01, size=6))
        pd.DataFrame({
            'participant_id': [f's{i}' for i in range(6)], 'DIA': dia,
            'AGE': 70, 'PTGENDER': 1, 'Reconstruction deviation': dev,
        }).to_csv(rep / 'deviation_3modalities.csv', index=False)

    bootstrap.analyze(_args('analyze'), project_root=tmp_path)
    aucs = pd.read_csv(tmp_path / 'bootstrap_auc.csv')
    # replicate 1 skipped; 0 and 2 keep their own (perfect) AUCs
    assert sorted(aucs['replicate']) == [0, 2]
    assert (aucs['auc'] == 1.0).all()


def test_train_binned_covariates_rejects_unseen_category():
    """Serving must fail loudly when a subject's categorical covariate was
    never seen in the train cohort (silent clamping would condition on the
    wrong demographic), including numeric-train vs string-serving skew."""
    from multi_modal_normative_modeling_tpu.data.preprocess import (
        train_binned_covariates,
    )

    train = pd.DataFrame({'AGE': np.linspace(60, 80, 30),
                          'PTGENDER': ['Female', 'Male'] * 15})
    ok = train_binned_covariates(train, train.iloc[:3])
    assert ok.shape[0] == 3
    bad = pd.DataFrame({'AGE': [70.0], 'PTGENDER': ['Unknown']})
    with pytest.raises(ValueError, match='Unknown'):
        train_binned_covariates(train, bad)
    num_train = pd.DataFrame({'AGE': np.linspace(60, 80, 30),
                              'PTGENDER': [1, 2] * 15})
    skew = pd.DataFrame({'AGE': [70.0], 'PTGENDER': ['Male']})
    with pytest.raises(ValueError, match='Male'):
        train_binned_covariates(num_train, skew)


def test_bootstrap_kill_and_resume_bit_identical(tmp_path):
    """bootstrap train --checkpoint_every/--resume: one whole-run state over
    the stacked replicate axis; kill-and-resume reproduces the uninterrupted
    run's replicate checkpoints bit-for-bit."""
    import jax

    from multi_modal_normative_modeling_tpu.train import load_checkpoint
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    ref_root = tmp_path / 'ref'
    res_root = tmp_path / 'res'
    for root in (ref_root, res_root):
        root.mkdir()
        make_synthetic_resource(root, 'ADNI', n_hc=50, n_disease={0: 20})
        bootstrap.create_ids(_args('create_ids'), project_root=root)

    bootstrap.train(_args('train'), project_root=ref_root)
    bootstrap.train(_args('train', epochs=3, checkpoint_every=3),
                    project_root=res_root)
    bootstrap.train(_args('train', checkpoint_every=3, resume=True),
                    project_root=res_root)

    model_dir = 'outputs/bootstrap_analysis/supervised_cvae'
    assert train_state_exists(res_root / model_dir)
    for rep in range(3):
        p_ref, _ = load_checkpoint(ref_root / model_dir / f'{rep:03d}')
        p_res, _ = load_checkpoint(res_root / model_dir / f'{rep:03d}')
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), p_ref, p_res)
