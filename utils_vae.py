"""Compatibility shim exposing the reference ``utils_vae`` API surface.

The deviation math, Logger and plot_losses come from the TPU-native package
(multi_modal_normative_modeling_tpu/infer/deviation.py, utils/logging.py).
The MyDataset* classes are framework-free ndarray equivalents of the
reference's torch Datasets (utils_vae.py:11-112): same constructor signatures
and __getitem__ layouts, returning numpy float32/int64 arrays instead of
torch tensors.
"""
from __future__ import annotations

import numpy as np

from multi_modal_normative_modeling_tpu.infer.deviation import (  # noqa: F401
    latent_deviation,
    latent_pvalues,
    reconstruction_deviation,
    separate_latent_deviation,
)
from multi_modal_normative_modeling_tpu.infer.deviation import (
    reconstruction_deviation_roi as reconstruction_deviation_seperate_roi,  # noqa: F401
)
from multi_modal_normative_modeling_tpu.utils.logging import (  # noqa: F401
    Logger,
    plot_losses,
)


def _to_float32(data):
    if isinstance(data, (list, tuple)):
        return [np.asarray(d, dtype=np.float32) for d in data]
    return np.asarray(data, dtype=np.float32)


class MyDataset:
    """Data-only dataset (utils_vae.py:82-112)."""

    def __init__(self, data, indices=False, transform=None):
        self.data = _to_float32(data)
        first = self.data[0] if isinstance(self.data, list) else self.data
        self.N = len(first) if isinstance(self.data, list) else len(self.data)
        self.shape = np.shape(first if isinstance(self.data, list) else self.data)
        self.indices = indices
        self.transform = transform

    def _item(self, index):
        if isinstance(self.data, list):
            return [d[index] for d in self.data]
        return self.data[index]

    def __getitem__(self, index):
        x = self._item(index)
        if self.transform:
            x = self.transform(x)
        if self.indices:
            return x, index
        return x

    def __len__(self):
        return self.N


class MyDataset_labels(MyDataset):
    """(data, covariate-labels) pairs (utils_vae.py:11-43)."""

    def __init__(self, data, labels, indices=False, transform=None):
        super().__init__(data, indices, transform)
        self.labels = np.asarray(labels, dtype=np.int64)

    def __getitem__(self, index):
        x = self._item(index)
        if self.transform:
            x = self.transform(x)
        t = self.labels[index]
        if self.indices:
            return x, t, index
        return x, t


class MyDataset_labels_endtoend(MyDataset):
    """(data, covariates, diagnosis) triples (utils_vae.py:46-80)."""

    def __init__(self, data, covariates, diagnosis_labels, transform=None):
        super().__init__(data, False, transform)
        self.covariates = np.asarray(covariates, dtype=np.float32)
        self.diagnosis_labels = np.asarray(diagnosis_labels, dtype=np.int64)

    def __getitem__(self, index):
        x = self._item(index)
        if self.transform:
            x = self.transform(x)
        return x, self.covariates[index], self.diagnosis_labels[index]
