"""Native C++ fastcsv loader: parity with pandas and speed sanity."""
import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.native import (
    FastCSV,
    fastcsv_available,
    read_feature_matrix,
)

pytestmark = pytest.mark.skipif(not fastcsv_available(),
                                reason="no C++ toolchain")


@pytest.fixture
def csv_file(tmp_path):
    rng = np.random.default_rng(0)
    n, d = 500, 40
    frame = pd.DataFrame(rng.normal(size=(n, d)),
                         columns=[f"ROI_{i}" for i in range(d)])
    frame.insert(0, "IID", [f"sub_{i:04d}" for i in range(n)])
    frame["note"] = ["text"] * n  # non-numeric column
    path = tmp_path / "mod.csv"
    frame.to_csv(path, index=False)
    return path, frame


def test_matches_pandas(csv_file):
    path, frame = csv_file
    cols = [f"ROI_{i}" for i in range(40)]
    ids, data = read_feature_matrix(path, cols)
    assert ids == list(frame["IID"])
    np.testing.assert_allclose(data, frame[cols].values, rtol=1e-15)


def test_subset_and_order(csv_file):
    path, frame = csv_file
    cols = ["ROI_7", "ROI_0", "ROI_33"]
    f = FastCSV(path)
    data = f.read_columns(cols)
    np.testing.assert_allclose(data, frame[cols].values, rtol=1e-15)
    assert f.n_rows == len(frame)
    assert f.col_index("missing") == -1
    f.close()


def test_non_numeric_becomes_nan(csv_file):
    path, _ = csv_file
    f = FastCSV(path)
    data = f.read_columns(["note"])
    assert np.isnan(data).all()
    f.close()


def test_multithreaded_matches_single(csv_file):
    path, frame = csv_file
    cols = [f"ROI_{i}" for i in range(40)]
    f = FastCSV(path)
    single = f.read_columns(cols, n_threads=1)
    multi = f.read_columns(cols, n_threads=8)
    np.testing.assert_array_equal(single, multi)
    f.close()


def test_crlf_and_trailing_newline(tmp_path):
    path = tmp_path / "crlf.csv"
    path.write_bytes(b"IID,a,b\r\ns1,1.5,2\r\ns2,-3,4e-2\r\n")
    f = FastCSV(path)
    assert f.n_rows == 2
    np.testing.assert_allclose(f.read_columns(["a", "b"]),
                               [[1.5, 2.0], [-3.0, 0.04]])
    assert f.read_string_column("IID") == ["s1", "s2"]
    f.close()


def test_quoted_fields_rfc4180(tmp_path):
    """Quoted headers, quoted string cells with embedded commas and doubled
    quotes, quoted numeric cells — parity with pandas."""
    path = tmp_path / "quoted.csv"
    path.write_text('"IID","a,x",b,"no""te"\n'
                    '"s,1","1.5",2,"he,""llo"""\n'
                    's2,-3,"4e-2",plain\n')
    ref = pd.read_csv(path)
    f = FastCSV(path)
    assert f.n_rows == 2
    assert f.read_string_column("IID") == list(ref["IID"])
    assert f.read_string_column('no"te') == ['he,"llo"', "plain"]
    np.testing.assert_allclose(f.read_columns(["a,x", "b"]),
                               ref[["a,x", "b"]].values)
    f.close()


def test_fast_path_disengage_reason_logged(tmp_path, caplog):
    """A wide table with missing cells falls back to pandas with a logged
    reason, exactly once, and the pipeline still loads the data."""
    import logging

    from multi_modal_normative_modeling_tpu.cli import common

    n, d = 20, 300
    rng = np.random.default_rng(0)
    frame = pd.DataFrame(rng.normal(size=(n, d)),
                         columns=[f"c{i}" for i in range(d)])
    frame.insert(0, "IID", [f"s{i}" for i in range(n)])
    frame.loc[3, "c7"] = np.nan  # legitimate missing value
    path = tmp_path / "wide_nan.csv"
    frame.to_csv(path, index=False)

    with caplog.at_level(logging.INFO, logger="mmnm.data"):
        out = common.read_csv_cached(path)
        # second (cache-busting) read: reason memoized, no native re-parse
        common._CSV_CACHE.clear()
        out2 = common.read_csv_cached(path)
    msgs = [r.message for r in caplog.records
            if "fast path disabled" in r.message]
    assert len(msgs) == 1 and "missing cells" in msgs[0]
    assert str(path) in common.fast_path_reasons
    pd.testing.assert_frame_equal(out, frame)
    pd.testing.assert_frame_equal(out2, frame)
    common.fast_path_reasons.clear()


def test_quoted_numeric_edge_cases(tmp_path):
    """Quoted cells with inner padding or a leading '+' parse like pandas."""
    path = tmp_path / "edge.csv"
    path.write_text('IID,a,b,c\ns1," 1.5 ","+3.25",+2\ns2,"-4e-2"," +0.5",7\n')
    ref = pd.read_csv(path)
    f = FastCSV(path)
    np.testing.assert_allclose(f.read_columns(["a", "b", "c"]),
                               ref[["a", "b", "c"]].values)
    f.close()


def test_embedded_newline_falls_back_to_pandas(tmp_path, caplog):
    """An embedded newline inside a quoted IID cell: the quote-parity row
    index counts rows correctly, but the '\\n'-joined string-column transport
    is ambiguous, so read_string_column refuses and the read falls back to
    pandas with a logged reason (never a silent mis-alignment)."""
    import logging

    from multi_modal_normative_modeling_tpu.cli import common

    n, d = 12, 300
    rng = np.random.default_rng(3)
    frame = pd.DataFrame(rng.normal(size=(n, d)),
                         columns=[f"c{i}" for i in range(d)])
    frame.insert(0, "IID", [f"s{i}" for i in range(n)])
    frame.loc[4, "IID"] = "s\n4"  # quoted + embedded newline on write
    path = tmp_path / "embedded_newline.csv"
    frame.to_csv(path, index=False)
    ref = pd.read_csv(path)
    assert ref.shape == (n, d + 1)  # pandas parses the quoted newline

    with caplog.at_level(logging.INFO, logger="mmnm.data"):
        out = common.read_csv_cached(path)
    msgs = [r.message for r in caplog.records
            if "fast path disabled" in r.message]
    assert len(msgs) == 1
    pd.testing.assert_frame_equal(out, ref)
    common.fast_path_reasons.clear()
    common._CSV_CACHE.clear()


def test_fast_path_memo_invalidated_on_rewrite(tmp_path, caplog):
    """A file once branded 'needs pandas' regains the native fast path after
    being rewritten clean (memo keyed by mtime like the CSV cache)."""
    import logging
    import os

    from multi_modal_normative_modeling_tpu.cli import common

    n, d = 20, 300
    rng = np.random.default_rng(2)
    frame = pd.DataFrame(rng.normal(size=(n, d)),
                         columns=[f"c{i}" for i in range(d)])
    frame.insert(0, "IID", [f"s{i}" for i in range(n)])
    dirty = frame.copy()
    dirty.loc[2, "c5"] = np.nan
    path = tmp_path / "rewrite.csv"
    dirty.to_csv(path, index=False)
    with caplog.at_level(logging.INFO, logger="mmnm.data"):
        common.read_csv_cached(path)
    assert str(path) in common.fast_path_reasons
    # rewrite clean with a newer mtime
    frame.to_csv(path, index=False)
    os.utime(path, ns=(path.stat().st_atime_ns,
                       path.stat().st_mtime_ns + 10_000_000))
    out = common.read_csv_cached(path)
    assert str(path) not in common.fast_path_reasons  # fast path re-engaged
    np.testing.assert_allclose(out[frame.columns[1:]].values,
                               frame[frame.columns[1:]].values, rtol=1e-15)
    common.fast_path_reasons.clear()


def test_fast_path_engages_on_clean_wide_table(tmp_path):
    from multi_modal_normative_modeling_tpu.cli import common

    n, d = 20, 300
    rng = np.random.default_rng(1)
    frame = pd.DataFrame(rng.normal(size=(n, d)),
                         columns=[f"c{i}" for i in range(d)])
    frame.insert(0, "IID", [f"s{i}" for i in range(n)])
    path = tmp_path / "wide.csv"
    frame.to_csv(path, index=False)
    out = common.read_csv_cached(path)
    assert str(path) not in common.fast_path_reasons
    assert list(out.columns) == list(frame.columns)
    np.testing.assert_allclose(out[frame.columns[1:]].values,
                               frame[frame.columns[1:]].values, rtol=1e-15)


def test_fastwrite_byte_parity_with_pandas(tmp_path):
    from multi_modal_normative_modeling_tpu.native.fastwrite import (
        fastwrite_available,
        write_frame,
    )

    if not fastwrite_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(0)
    n = 500
    values = np.concatenate([
        rng.normal(size=n - 12),
        np.array([0.0, -0.0, 1e16, 1e15, 1e-4, 1e-5, 2.5e-4, 2.0, np.nan,
                  5e-324, 0.001, 123456789.0]),
    ])
    frame = pd.DataFrame({
        "participant_id": [f"s{i}" for i in range(n)],
        "DIA": rng.integers(0, 3, size=n).astype(np.int64),
        "f64": values,
        "f32": values.astype(np.float32),
    })
    frame.to_csv(tmp_path / "ref.csv", index=False)
    assert write_frame(tmp_path / "fast.csv", frame)
    assert (tmp_path / "fast.csv").read_bytes() == \
        (tmp_path / "ref.csv").read_bytes()


def test_fastwrite_extreme_exponents(tmp_path):
    """3-digit exponents, denormals, ±inf and float32 format-policy edges."""
    from multi_modal_normative_modeling_tpu.native.fastwrite import (
        fastwrite_available,
        write_frame,
    )

    if not fastwrite_available():
        pytest.skip("no C++ toolchain")
    f64 = np.array([1e100, -1e100, 1e-100, 1.7976931348623157e308,
                    2.2250738585072014e-308, -4.9e-324, np.inf, -np.inf,
                    9.999999999999999e15, 1.0000000000000002,
                    3.141592653589793e-5, -0.0001, 12345.6789e90])
    f32 = np.array([3.4028235e38, 1.1754944e-38, 1e-45, -6.1e-5, 9.9e-5,
                    1.00001e-4, np.inf, -np.inf, 16777216.0, 1.5e-7,
                    7.0e37, -2.802597e-45, 0.0], dtype=np.float32)
    frame = pd.DataFrame({"id": [f"s{i}" for i in range(len(f64))],
                          "f64": f64, "f32": f32})
    frame.to_csv(tmp_path / "ref.csv", index=False)
    assert write_frame(tmp_path / "fast.csv", frame)
    assert (tmp_path / "fast.csv").read_bytes() == \
        (tmp_path / "ref.csv").read_bytes()


def test_fastwrite_falls_back_on_quoting(tmp_path):
    from multi_modal_normative_modeling_tpu.native.fastwrite import (
        fastwrite_available,
        write_frame,
    )

    if not fastwrite_available():
        pytest.skip("no C++ toolchain")
    frame = pd.DataFrame({"s": ["a,b", "c"], "v": [1.0, 2.0]})
    assert write_frame(tmp_path / "x.csv", frame) is False


def test_blank_lines_skipped_like_pandas(tmp_path):
    """Mid-file and repeated trailing blank lines must not become ghost
    all-NaN rows (pandas skip_blank_lines=True semantics)."""
    path = tmp_path / "blank.csv"
    path.write_text("IID,a,b\ns1,1,2\n\ns2,3,4\n\n\n")
    reader = FastCSV(path)
    try:
        assert reader.n_rows == 2
        assert reader.read_string_column("IID") == ["s1", "s2"]
        values = reader.read_columns(["a", "b"])
    finally:
        reader.close()
    np.testing.assert_array_equal(values, [[1.0, 2.0], [3.0, 4.0]])


def test_header_only_no_trailing_newline(tmp_path):
    """A header-only file without a trailing newline is an empty frame (what
    pandas returns), not an open error."""
    path = tmp_path / "empty.csv"
    path.write_text("IID," + ",".join(f"c{i}" for i in range(300)))
    reader = FastCSV(path)
    try:
        assert reader.n_rows == 0
        assert reader.n_cols == 301
    finally:
        reader.close()


def test_fastwrite_falls_back_on_header_metachars(tmp_path):
    from multi_modal_normative_modeling_tpu.native.fastwrite import (
        write_frame,
    )

    frame = pd.DataFrame({"a,x": [1.0, 2.0], "b": [3.0, 4.0]})
    path = tmp_path / "out.csv"
    assert write_frame(path, frame) is False  # comma in a column NAME
    frame.to_csv(path, index=False)  # the caller's fallback
    assert path.read_text().splitlines()[0] == '"a,x",b'


def test_fastwrite_falls_back_on_nul_byte(tmp_path):
    from multi_modal_normative_modeling_tpu.native.fastwrite import (
        write_frame,
    )

    frame = pd.DataFrame({"s": ["a\x00b", "cd"], "v": [1.0, 2.0]})
    assert write_frame(tmp_path / "out.csv", frame) is False


def test_embedded_newlines_native_row_index(tmp_path):
    """Full RFC4180: quoted cells embedding newlines (and CRLF endings) are
    parsed natively — the quote-parity row index keeps rows aligned, numeric
    parity with pandas holds, and only the ambiguous string-column transport
    refuses."""
    from multi_modal_normative_modeling_tpu.native.fastcsv import FastCSV

    path = tmp_path / "embedded.csv"
    path.write_text(
        'IID,"a\nx",b\r\n'      # multi-line quoted header cell
        '"S\n1",1.5," 2.5"\r\n'  # embedded newline in the id cell
        'S2,"-3e1",+4\n'
        'S3,"1""",7\n')          # doubled-quote escape -> non-numeric
    ref = pd.read_csv(path)
    r = FastCSV(path)
    try:
        assert (r.n_rows, r.n_cols) == (3, 3) == (len(ref), ref.shape[1])
        vals = r.read_columns(["a\nx", "b"])
        np.testing.assert_allclose(vals[:, 1], [2.5, 4.0, 7.0])
        np.testing.assert_allclose(vals[:2, 0], [1.5, -30.0])
        assert np.isnan(vals[2, 0])  # '1"' is a string for pandas too
        with pytest.raises(RuntimeError, match="embedded newlines"):
            r.read_string_column("IID")
    finally:
        r.close()


def test_stray_unquoted_quote_is_literal(tmp_path):
    """A stray '\"' inside an unquoted field is a literal character for
    pandas (QUOTE_MINIMAL read); the row index must not treat it as opening
    a quoted run that swallows the following newlines."""
    path = tmp_path / "stray.csv"
    path.write_text('IID,a,b\nS"1,1.5,2.5\nS2,3.0,4.0\nS3,5.0,6.0\n')
    ref = pd.read_csv(path)
    r = FastCSV(path)
    try:
        assert r.n_rows == 3 == len(ref)
        assert r.read_string_column("IID") == ['S"1', "S2", "S3"]
        np.testing.assert_allclose(r.read_columns(["a", "b"]),
                                   ref[["a", "b"]].values)
    finally:
        r.close()


def test_read_feature_matrix_falls_back_on_embedded_newline_ids(tmp_path):
    """read_feature_matrix's documented contract is 'native when possible,
    pandas otherwise': an id column with embedded newlines (which
    read_string_column refuses) must fall back, not crash."""
    path = tmp_path / "nl_ids.csv"
    path.write_text('IID,a,b\n"S\n1",1.5,2.5\nS2,3.0,4.0\n')
    ids, data = read_feature_matrix(path, ["a", "b"])
    assert ids == ["S\n1", "S2"]
    np.testing.assert_allclose(data, [[1.5, 2.5], [3.0, 4.0]])


def test_multichunk_quote_parity(tmp_path):
    """Quoted fields in a >4MB file (where the 16-thread chunked index would
    engage): the quote-detecting scan must hand off to the serial pandas-
    semantics state machine and agree with pandas on every row."""
    from multi_modal_normative_modeling_tpu.native.fastcsv import FastCSV

    rng = np.random.default_rng(0)
    rows, cols = 26000, 12
    names = [f"c{j}" for j in range(cols)]
    path = tmp_path / "big_quotes.csv"
    with open(path, "w") as f:
        f.write("IID," + ",".join(names) + "\n")
        for i in range(rows):
            cells = [f"S{i}"]
            for j in range(cols):
                v = rng.normal() * 10.0 ** int(rng.integers(-3, 4))
                k = i * cols + j
                if k % 499 == 0:
                    cells.append(f'"{v!r}"')       # quoted numeric
                elif k % 503 == 0:
                    cells.append(f'" {v!r} "')     # quoted + padded
                else:
                    cells.append(repr(v))
            f.write(",".join(cells) + "\n")
    assert path.stat().st_size > (4 << 20)

    # round_trip parser: pandas' default ('legacy'-style) float parser is
    # lossy on full-precision repr strings; from_chars is correctly rounded
    ref = pd.read_csv(path, float_precision="round_trip")
    r = FastCSV(path)
    try:
        assert r.n_rows == rows == len(ref)
        vals = r.read_columns(names)
        ids = r.read_string_column("IID")
    finally:
        r.close()
    np.testing.assert_array_equal(vals, ref[names].values)
    assert ids == list(ref["IID"])
