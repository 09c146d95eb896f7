"""Native loader inside the pipeline data path: wide frames read through
fastcsv must equal pd.read_csv exactly, and the PPMI pipeline still works."""
import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.cli import common
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.native import fastcsv_available

pytestmark = pytest.mark.skipif(not fastcsv_available(),
                                reason="no C++ toolchain")


def test_wide_frame_matches_pandas(tmp_path):
    data_dir = make_synthetic_resource(
        tmp_path, "PPMI", n_hc=20, n_disease={0: 10},
        modalities=["PPMI_new_modal1_upper_tri"])
    path = data_dir / "PPMI_new_modal1_upper_tri.csv"

    fast = common._read_modality_fast(path)
    assert fast is not None, "wide numeric frame should take the native path"
    ref = pd.read_csv(path)
    assert list(fast.columns) == list(ref.columns)
    assert list(fast["IID"]) == list(ref["IID"])
    # fastcsv (std::from_chars) is correctly rounded; pandas' default parser
    # can be 1 ulp off — allow exactly that
    np.testing.assert_allclose(fast.drop(columns="IID").values,
                               ref.drop(columns="IID").values,
                               rtol=0, atol=1e-15)

    cached = common.read_csv_cached(path)
    pd.testing.assert_frame_equal(cached, fast)


def test_narrow_and_mixed_frames_fall_back(tmp_path):
    # y.csv is narrow and mixed-type -> pandas path
    data_dir = make_synthetic_resource(tmp_path, "ADNI", n_hc=10,
                                       n_disease={0: 5})
    assert common._read_modality_fast(data_dir / "y.csv") is None
    assert common._read_modality_fast(data_dir / "av45.csv") is None  # 90 cols
