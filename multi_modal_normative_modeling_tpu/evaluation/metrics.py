"""Deviation-to-classification metrics.

Re-implements multimodal_kfold_cvae_group_analysis_1x1.py:39-157: ROC/AUC on
the scalar deviation score, Youden-J optimal thresholding (plus the f1 / pr /
cost / eer threshold finders), accuracy, sensitivity, specificity, and the
significance ratio AUC/(1-AUC).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _roc_curve(labels: np.ndarray, scores: np.ndarray):
    from sklearn.metrics import roc_curve

    return roc_curve(labels, scores)


def classification_performance(error_hc, error_patient, training_class: str,
                               optimal_threshold=None, method: str = "roc"
                               ) -> Tuple[float, float, float, float, float]:
    """(roc_auc, accuracy, recall, specificity, significance_ratio).

    Label direction follows group_analysis:115-121: with training_class 'nm'
    patients are the positive class (higher deviation = disease); with 'dm'
    (disease modeling) HC are positive.
    """
    from sklearn.metrics import auc

    error_hc = np.asarray(error_hc, dtype=float)
    error_patient = np.asarray(error_patient, dtype=float)
    if training_class == "nm":
        labels = np.concatenate(
            [np.zeros_like(error_hc), np.ones_like(error_patient)]
        )
    elif training_class == "dm":
        labels = np.concatenate(
            [np.ones_like(error_hc), np.zeros_like(error_patient)]
        )
    else:
        raise ValueError(f"Unknown training_class: {training_class}")
    predictions = np.concatenate([error_hc, error_patient])

    fpr, tpr, thresholds = _roc_curve(labels, predictions)
    roc_auc = auc(fpr, tpr)

    if optimal_threshold is None:
        if method == "roc":
            optimal_threshold = thresholds[np.argmax(tpr - fpr)]
        elif method == "f1":
            optimal_threshold, _ = find_best_threshold_by_f1(labels, predictions)
        elif method == "pr":
            optimal_threshold = find_best_threshold_by_pr(labels, predictions)
        elif method == "cost":
            optimal_threshold, _ = find_best_threshold_by_cost(
                labels, predictions, cost_fn=1, cost_fp=1
            )
        elif method == "eer":
            optimal_threshold = find_best_threshold_by_eer(labels, predictions)
        else:
            raise ValueError("Unknown method for finding optimal threshold")

    predicted = (predictions >= optimal_threshold).astype(int)
    accuracy = float(np.mean(predicted == labels))
    tp = np.sum((predicted == 1) & (labels == 1))
    fn = np.sum((predicted == 0) & (labels == 1))
    tn = np.sum((predicted == 0) & (labels == 0))
    fp = np.sum((predicted == 1) & (labels == 0))
    recall = tp / (tp + fn)
    specificity = tn / (tn + fp)
    # np.float64 division: AUC == 1.0 yields inf (reference behavior) rather
    # than raising ZeroDivisionError.
    significance_ratio = np.float64(roc_auc) / (1.0 - np.float64(roc_auc))
    return roc_auc, accuracy, float(recall), float(specificity), significance_ratio


def classification_thresholds(error_hc, error_patient):
    """(roc_auc, accuracy, optimal_threshold) with the HC-positive label
    direction (compute_classification_thresholds, group_analysis:39-59)."""
    from sklearn.metrics import auc

    error_hc = np.asarray(error_hc, dtype=float)
    error_patient = np.asarray(error_patient, dtype=float)
    labels = np.concatenate(
        [np.ones_like(error_hc), np.zeros_like(error_patient)]
    )
    predictions = np.concatenate([error_hc, error_patient])
    fpr, tpr, thresholds = _roc_curve(labels, predictions)
    roc_auc = auc(fpr, tpr)
    optimal_threshold = thresholds[np.argmax(tpr - fpr)]
    predicted = (predictions > optimal_threshold).astype(int)
    accuracy = float(np.mean(predicted == labels))
    return roc_auc, accuracy, optimal_threshold


def _threshold_grid(predictions):
    # the reference scans linspace(0, 1) (group_analysis:63-141), which is
    # only meaningful for probability-like scores; these finders are live
    # here via --threshold_method on raw deviation scores (often all > 1),
    # where a [0,1] scan degenerates to "everything positive". Scan the
    # observed score range instead (same 100-point granularity).
    predictions = np.asarray(predictions, dtype=float)
    return np.linspace(predictions.min(), predictions.max(), 100)


def find_best_threshold_by_f1(labels, predictions):
    from sklearn.metrics import f1_score

    best_threshold, best_f1 = 0.0, 0.0
    for threshold in _threshold_grid(predictions):
        predicted = (np.asarray(predictions) >= threshold).astype(int)
        f1 = f1_score(labels, predicted)
        if f1 > best_f1:
            best_f1, best_threshold = f1, threshold
    return best_threshold, best_f1


def find_best_threshold_by_pr(labels, predictions):
    from sklearn.metrics import precision_recall_curve

    precision, recall, thresholds = precision_recall_curve(labels, predictions)
    with np.errstate(invalid="ignore"):
        f1_scores = 2 * (precision * recall) / (precision + recall)
    # the reference's formula (group_analysis:77-80) leaves 0/0 = NaN where
    # precision = recall = 0; raw argmax would then return the NaN index
    # (e.g. whenever the top-scored sample is a negative) — treat undefined
    # F1 as 0 so the best DEFINED threshold wins
    return thresholds[np.argmax(np.nan_to_num(f1_scores, nan=0.0))]


def find_best_threshold_by_cost(labels, predictions, cost_fn, cost_fp):
    labels = np.asarray(labels)
    best_threshold, best_cost = 0.0, float("inf")
    for threshold in _threshold_grid(predictions):
        predicted = (np.asarray(predictions) >= threshold).astype(int)
        fp = np.sum((predicted == 1) & (labels == 0))
        fn = np.sum((predicted == 0) & (labels == 1))
        cost = fp * cost_fp + fn * cost_fn
        if cost < best_cost:
            best_cost, best_threshold = cost, threshold
    return best_threshold, best_cost


def find_best_threshold_by_eer(labels, predictions):
    fpr, tpr, thresholds = _roc_curve(np.asarray(labels), np.asarray(predictions))
    fnr = 1 - tpr
    return thresholds[np.nanargmin(np.abs(fnr - fpr))]


def binary_prediction_metrics(all_labels, all_preds) -> dict:
    """End-to-end argmax-class metrics (nmpmcont evaluate(), :29-70)."""
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        f1_score,
        recall_score,
        roc_auc_score,
    )

    all_labels = np.asarray(all_labels)
    all_preds = np.asarray(all_preds)
    try:
        auroc = roc_auc_score(all_labels, all_preds)
    except ValueError:
        auroc = float("nan")
    # labels pinned so a degenerate single-class fold (the case the
    # roc_auc try/except above already anticipates) still yields a 2x2
    tn, fp, fn, tp = confusion_matrix(all_labels, all_preds,
                                      labels=[0, 1]).ravel()
    return {
        "accuracy": accuracy_score(all_labels, all_preds),
        "auroc": auroc,
        "sensitivity": recall_score(all_labels, all_preds),
        "specificity": (tn / (tn + fp) if (tn + fp) else float("nan")),
        "f1_score": f1_score(all_labels, all_preds),
    }
