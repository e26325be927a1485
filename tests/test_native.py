"""Native C++ atomic reader == pandas path, cell for cell.

The reader (recbole_tpu/native/atomic_fast.cpp) fast-paths scalar-column
files; these tests pin its equivalence on NA sentinels, ragged rows, CRLF,
blank lines, unicode tokens, and the fallback on seq columns / quoted cells.
"""

import numpy as np
import pandas as pd
import pytest

from recbole_tpu.data.atomic import read_atomic_file
from recbole_tpu import native


def _both(path):
    c1, t1 = read_atomic_file(str(path), native=False)
    c2, t2 = read_atomic_file(str(path), native=True)
    assert t1 == t2
    assert list(c1) == list(c2)
    return c1, c2


def _assert_same(c1, c2):
    for f in c1:
        a, b = c1[f], c2[f]
        assert a.dtype == b.dtype, (f, a.dtype, b.dtype)
        if a.dtype == object:
            assert all((pd.isna(x) and pd.isna(y)) or x == y
                       for x, y in zip(a, b)), f
        else:
            np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def lib_ok():
    if native._load_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_scalar_equivalence(tmp_path, lib_ok):
    p = tmp_path / "t.inter"
    p.write_text(
        "user_id:token\titem_id:token\trating:float\tts:float\n"
        "u1\ti1\t5\t100\n"
        "u2\t\tNaN\t101\n"          # empty token + NaN float
        "\n"                          # blank line (skipped by pandas)
        "u1\ti2\t3.5\t\n"            # empty float cell
        "名前\tNA\t-2e3\t103\n",     # unicode token, NA sentinel
        encoding="utf-8")
    c1, c2 = _both(p)
    _assert_same(c1, c2)
    assert c2["user_id"][3] == "名前"
    assert pd.isna(c2["item_id"][1]) and pd.isna(c2["item_id"][3])
    assert np.isnan(c2["rating"][1]) and np.isnan(c2["ts"][2])
    assert c2["rating"][3] == np.float32(-2e3)


def test_crlf_and_short_rows(tmp_path, lib_ok):
    p = tmp_path / "t.inter"
    p.write_bytes(b"a:token\tb:float\r\nx\t1\r\ny\r\nz\t3\r\n")
    c1, c2 = _both(p)
    _assert_same(c1, c2)
    assert list(c2["a"]) == ["x", "y", "z"]
    assert np.isnan(c2["b"][1])


def test_usecols_positions(tmp_path, lib_ok):
    """Selected columns keep their file positions (middle column skipped)."""
    p = tmp_path / "t.inter"
    p.write_text("a:token\tskip:float\tb:float\nx\t9\t1\ny\t8\t2\n")
    c1, t1 = read_atomic_file(str(p), usecols=["a", "b"], native=False)
    c2, t2 = read_atomic_file(str(p), usecols=["a", "b"], native=True)
    assert list(c2) == ["a", "b"]
    _assert_same(c1, c2)
    np.testing.assert_array_equal(c2["b"], np.array([1, 2], np.float32))


def test_seq_columns_fall_back(tmp_path, lib_ok):
    p = tmp_path / "t.item"
    p.write_text("i:token\tgenres:token_seq\nx\ta b\ny\tc\n")
    c2, t2 = read_atomic_file(str(p), native=True)
    assert list(c2["genres"][0]) == ["a", "b"]


def test_quoted_field_falls_back(tmp_path, lib_ok):
    p = tmp_path / "t.inter"
    p.write_text('a:token\tb:float\n"x"\t1\n')
    c1, c2 = _both(p)          # native detects the quote and defers to pandas
    _assert_same(c1, c2)
    assert c2["a"][0] == "x"   # csv quoting applied


def test_factorized_column_shares_string_objects(tmp_path, lib_ok):
    """The rebuild is a pointer fancy-index: repeated tokens are the SAME
    Python object (the memory win behind the factorized ABI)."""
    p = tmp_path / "t.inter"
    p.write_text("a:token\tb:float\nu1\t1\nu2\t2\nu1\t3\n")
    c2, _ = read_atomic_file(str(p), native=True)
    assert c2["a"][0] is c2["a"][2]
