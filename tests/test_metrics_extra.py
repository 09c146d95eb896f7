"""Threshold finders, determinism, and error paths."""
import jax
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.evaluation import metrics
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig


@pytest.fixture
def scored():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, size=200)
    predictions = np.clip(labels * 0.4 + rng.random(200) * 0.6, 0, 1)
    return labels, predictions


def test_threshold_finder_f1(scored):
    labels, predictions = scored
    from sklearn.metrics import f1_score

    threshold, best = metrics.find_best_threshold_by_f1(labels, predictions)
    # re-check: no other grid threshold beats it (the grid spans the
    # OBSERVED score range — see metrics._threshold_grid)
    for t in np.linspace(predictions.min(), predictions.max(), 100):
        f1 = f1_score(labels, (predictions >= t).astype(int))
        assert f1 <= best + 1e-12


def test_threshold_finder_pr(scored):
    labels, predictions = scored
    t = metrics.find_best_threshold_by_pr(labels, predictions)
    assert 0 <= t <= 1


def test_threshold_finder_cost(scored):
    labels, predictions = scored
    t, cost = metrics.find_best_threshold_by_cost(labels, predictions, 1, 1)
    predicted = (predictions >= t).astype(int)
    fp = np.sum((predicted == 1) & (labels == 0))
    fn = np.sum((predicted == 0) & (labels == 1))
    assert cost == fp + fn


def test_threshold_finder_eer(scored):
    labels, predictions = scored
    from sklearn.metrics import roc_curve

    t = metrics.find_best_threshold_by_eer(labels, predictions)
    fpr, tpr, thresholds = roc_curve(labels, predictions)
    idx = np.argmin(np.abs(thresholds - t))
    assert abs((1 - tpr[idx]) - fpr[idx]) < 0.15  # near the EER point


def test_classification_thresholds_direction():
    rng = np.random.default_rng(1)
    hc = 1.0 + 0.05 * rng.random(50)
    patient = 0.2 + 0.05 * rng.random(50)
    auc, acc, threshold = metrics.classification_thresholds(hc, patient)
    assert auc == 1.0
    # strict '>' at the Youden threshold (group_analysis:51-57): one boundary
    # sample lands on the wrong side
    assert acc >= 0.98
    assert 0.2 < threshold < 1.06


def test_training_is_deterministic():
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", [12], [8, 8], 4, 3, 1)
    data = [rng.normal(size=(20, 12)).astype(np.float32)]
    cov = [rng.normal(size=(20, 3)).astype(np.float32)]
    config = TrainConfig(epochs=4, batch_size=8, combine="poe")
    trainer = FoldTrainer(model, config, 20)
    p0 = model.init_params(jax.random.PRNGKey(0))

    a, _ = trainer.run(p0, data, cov, key=jax.random.PRNGKey(5))
    b, _ = trainer.run(p0, data, cov, key=jax.random.PRNGKey(5))
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_unknown_model_and_resource():
    with pytest.raises(ValueError, match="not recognized"):
        build_model("nope", [10], [8, 8], 4, 3, 1)
    from multi_modal_normative_modeling_tpu import registry

    with pytest.raises(ValueError):
        registry.get_datasets_name("NOPE", "SE-PoE")


def test_bad_fusion_name():
    import jax.numpy as jnp

    from multi_modal_normative_modeling_tpu.ops import fusion

    with pytest.raises(ValueError, match="No such combination"):
        fusion.combine_latent(jnp.ones((2, 3, 4)), jnp.ones((2, 3, 4)),
                              "nope")


def test_binary_prediction_metrics_single_class_fold():
    """A degenerate fold where labels and predictions are one class must
    yield metrics, not a confusion-matrix unpack crash (the roc try/except
    two lines up already anticipates this case)."""
    import numpy as np

    from multi_modal_normative_modeling_tpu.evaluation.metrics import (
        binary_prediction_metrics,
    )

    m = binary_prediction_metrics(np.zeros(8, int), np.zeros(8, int))
    assert m["accuracy"] == 1.0
    assert np.isnan(m["auroc"])
    assert m["specificity"] == 1.0

    m1 = binary_prediction_metrics(np.ones(8, int), np.ones(8, int))
    assert m1["accuracy"] == 1.0 and m1["sensitivity"] == 1.0


def test_threshold_finders_scan_observed_score_range():
    """--threshold_method f1/cost run on raw deviation scores (often all
    > 1); a linspace(0,1) scan would classify everything positive and
    return threshold 0."""
    import numpy as np

    from multi_modal_normative_modeling_tpu.evaluation.metrics import (
        find_best_threshold_by_cost,
        find_best_threshold_by_f1,
    )

    rng = np.random.default_rng(0)
    neg = rng.normal(5.0, 0.3, 50)     # scores far outside [0, 1]
    pos = rng.normal(8.0, 0.3, 50)
    labels = np.r_[np.zeros(50), np.ones(50)]
    scores = np.r_[neg, pos]

    thr_f1, best_f1 = find_best_threshold_by_f1(labels, scores)
    assert 5.0 < thr_f1 < 8.5 and best_f1 > 0.95
    thr_cost, _ = find_best_threshold_by_cost(labels, scores, 1.0, 1.0)
    assert 5.0 < thr_cost < 8.5
