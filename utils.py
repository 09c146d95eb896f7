"""Compatibility shim exposing the reference ``utils`` API surface
(column registries, dataset loading, k-fold id generation, registry lookups)
from the TPU-native package, so code written against the reference repo
imports unchanged. See multi_modal_normative_modeling_tpu/registry.py and
data/loading.py for the implementations (with file:line citations)."""
from pathlib import Path

from multi_modal_normative_modeling_tpu import registry as _registry
from multi_modal_normative_modeling_tpu.data.loading import (  # noqa: F401
    cliff_delta,
    generate_kfold_ids,
    generate_kfold_ids_endtoend,
    generate_kfold_ids_with_unigroup,
    load_dataset,
    load_demographic_data,
)
from multi_modal_normative_modeling_tpu.registry import (  # noqa: F401
    get_column_name,
    get_datasets_name,
    get_hc_label,
)

PROJECT_ROOT = Path.cwd()

# Lazy module attributes (PEP 562), mirroring registry.py's design: plain
# `import utils` must not read roi_labels.json or build the 3485-column
# PPMI / 270-column 3-modalities lists unless a registry is actually used.
# COLUMNS_NAME_HCP_fMRI_100 is served here although absent from the
# reference utils.py — its early_fusion_modalities.py imports it and
# crashes (SURVEY.md section 2.1).
_REGISTRY_ATTRS = frozenset({
    "COLUMNS_NAME", "COLUMNS_NAME_VBM", "COLUMNS_NAME_SNP",
    "COLUMNS_NAME_AAL116", "COLUMNS_HCP", "COLUMNS_NAME_PPMI",
    "COLUMNS_3MODALITIES", "COLUMNS_NAME_HCP_fMRI_100",
})


def __getattr__(name):
    if name in _REGISTRY_ATTRS:
        return getattr(_registry, name)
    raise AttributeError(f"module 'utils' has no attribute {name!r}")
