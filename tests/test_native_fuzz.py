"""Randomized structural fuzz of the native data plane against pandas.

The targeted tests in test_native.py each pin ONE edge feature (quoted
fields, embedded newlines, CRLF, exponent extremes, ...). These fuzz cases
draw random tables that MIX all of them — random shapes, dtype mixes, NaN
cells, magnitude-stratified floats, metacharacter-bearing strings — and
assert the native reader/writer either matches pandas exactly or falls back
through its documented refusal paths (reference CSV semantics: pandas
read_csv/to_csv defaults, utils.py:112-122 / the 5-CSV emitters).

Deterministic: every case derives from a fixed per-case seed.
"""
import string

import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.native import (
    FastCSV,
    fastcsv_available,
    read_feature_matrix,
)
from multi_modal_normative_modeling_tpu.native.fastwrite import (
    fastwrite_available,
    write_frame,
)

N_READ_CASES = 40
N_WRITE_CASES = 60

_WORD = list(string.ascii_letters)
# metacharacters that force pandas' QUOTE_MINIMAL quoting (and, for the
# writer, the documented native fallback)
_SPICE = [",", '"', " ", "é", "ü", "'", ";", "\t"]


def _rand_string(rng, allow_newline=False):
    """A non-empty, non-numeric-looking cell (letter prefix)."""
    n = int(rng.integers(1, 10))
    chars = [str(rng.choice(_WORD))]
    for _ in range(n):
        if rng.random() < 0.15:
            chars.append(str(rng.choice(_SPICE)))
        elif allow_newline and rng.random() < 0.04:
            chars.append("\n")
        else:
            chars.append(str(rng.choice(_WORD)))
    return "".join(chars)


def _rand_floats(rng, n):
    """Magnitude-stratified doubles with specials sprinkled in."""
    mant = rng.uniform(-1, 1, size=n)
    exp = rng.integers(-300, 301, size=n).astype(np.float64)
    vals = mant * 10.0 ** exp
    specials = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324,
                         1e16, 1e15, 2.0, 1.0000000000000002])
    mask = rng.random(n) < 0.15
    vals[mask] = rng.choice(specials, size=int(mask.sum()))
    return vals


@pytest.mark.skipif(not fastcsv_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("case", range(N_READ_CASES))
def test_fastcsv_fuzz_parity(tmp_path, case):
    rng = np.random.default_rng(10_000 + case)
    n_rows = int(rng.integers(0, 60))
    n_num = int(rng.integers(1, 7))
    n_str = int(rng.integers(0, 3))

    # ids carry metacharacters too (quoted-IID path through
    # read_feature_matrix), just never newlines — that refusal is exercised
    # through the dedicated string columns below
    frame = pd.DataFrame({"IID": [f"s{i:03d}{_rand_string(rng)}"
                                  for i in range(n_rows)]})
    num_cols, str_cols = [], []
    for j in range(n_num):
        name = f"v{j}"
        vals = _rand_floats(rng, n_rows)
        kind = rng.random()
        if kind < 0.25:
            vals = rng.integers(-10**9, 10**9, size=n_rows).astype(np.float64)
        vals[rng.random(n_rows) < 0.1] = np.nan  # legit missing cells
        frame[name] = vals
        num_cols.append(name)
    for j in range(n_str):
        name = f"t{j}"
        frame[name] = [_rand_string(rng, allow_newline=True)
                       for _ in range(n_rows)]
        str_cols.append(name)

    path = tmp_path / "fuzz.csv"
    lineterm = "\r\n" if rng.random() < 0.25 else None
    frame.to_csv(path, index=False,
                 **({"lineterminator": lineterm} if lineterm else {}))

    ref = pd.read_csv(path)
    f = FastCSV(path)
    try:
        assert f.n_rows == len(ref)
        got = f.read_columns(num_cols,
                             n_threads=int(rng.choice([1, 16])))
        # from_chars is correctly rounded, so the native read recovers the
        # ORIGINAL doubles exactly (to_csv writes shortest-round-trip repr)
        np.testing.assert_array_equal(got, frame[num_cols].values)
        # pandas' default "high" converter drifts a few ulps at extreme
        # magnitudes — parity with pandas' own parse is only near-exact
        np.testing.assert_allclose(got, ref[num_cols].values,
                                   rtol=1e-12, atol=0, equal_nan=True)
        for name in str_cols:
            cells = list(frame[name])
            if any("\n" in c for c in cells):
                # documented refusal: '\n'-joined transport is ambiguous
                with pytest.raises(RuntimeError):
                    f.read_string_column(name)
            elif n_rows:
                assert f.read_string_column(name) == \
                    list(ref[name].astype(str))
    finally:
        f.close()

    # the pipeline entry point must return pandas-parity results whether it
    # used the native path or fell back
    ids, data = read_feature_matrix(path, num_cols)
    assert ids == list(ref["IID"].astype(str))
    # loose enough to hold whether the native path or the pandas fallback
    # served the call (pandas' parser drifts ulps at extreme magnitudes)
    np.testing.assert_allclose(data, frame[num_cols].values,
                               rtol=1e-12, atol=0, equal_nan=True)


@pytest.mark.skipif(not fastwrite_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("case", range(N_WRITE_CASES))
def test_fastwrite_fuzz_parity(tmp_path, case):
    rng = np.random.default_rng(20_000 + case)
    n_rows = int(rng.integers(0, 50))

    spicy_header = rng.random() < 0.1
    frame = pd.DataFrame({
        ("id,x" if spicy_header else "id"):
            [f"s{i}" for i in range(n_rows)]})
    spicy_cell = False
    for j in range(int(rng.integers(1, 6))):
        kind = rng.random()
        if kind < 0.3:
            frame[f"f64_{j}"] = _rand_floats(rng, n_rows)
        elif kind < 0.5:
            frame[f"f32_{j}"] = _rand_floats(rng, n_rows).astype(np.float32)
        elif kind < 0.7:
            frame[f"i64_{j}"] = rng.integers(
                -2**63, 2**63 - 1, size=n_rows, dtype=np.int64,
                endpoint=True)
        else:
            cells = []
            for _ in range(n_rows):
                if rng.random() < 0.08:
                    cells.append(_rand_string(rng) +
                                 str(rng.choice([",", '"', "\r", "\n"])))
                    spicy_cell = True
                else:
                    cells.append("".join(
                        str(rng.choice(_WORD))
                        for _ in range(int(rng.integers(1, 8)))))
            frame[f"s_{j}"] = cells

    ref_path, fast_path = tmp_path / "ref.csv", tmp_path / "fast.csv"
    frame.to_csv(ref_path, index=False)
    handled = write_frame(fast_path, frame)

    if spicy_header or spicy_cell:
        # metacharacters need pandas' quoting: the native path must refuse
        assert handled is False
        assert b'"' in ref_path.read_bytes() or n_rows == 0
    else:
        assert handled is True
        assert fast_path.read_bytes() == ref_path.read_bytes()
