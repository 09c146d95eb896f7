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

COLUMNS_NAME = _registry.COLUMNS_NAME
COLUMNS_NAME_VBM = _registry.COLUMNS_NAME_VBM
COLUMNS_NAME_SNP = _registry.COLUMNS_NAME_SNP
COLUMNS_NAME_AAL116 = _registry.COLUMNS_NAME_AAL116
COLUMNS_HCP = _registry.COLUMNS_HCP
COLUMNS_NAME_PPMI = _registry.COLUMNS_NAME_PPMI
COLUMNS_3MODALITIES = _registry.COLUMNS_3MODALITIES
# defined here although absent from the reference utils.py — its
# early_fusion_modalities.py imports it and crashes (SURVEY.md section 2.1)
COLUMNS_NAME_HCP_fMRI_100 = _registry.COLUMNS_NAME_HCP_fMRI_100
