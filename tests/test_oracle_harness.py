"""Meta-tests: the differential harness must DETECT wrongness, not just
bless matching frames — a vacuous comparator would green-light everything.
Driven against tools/oracle_check's comparator with synthetic frames."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from oracle_check import normalize, values_match  # noqa: E402


def _n(df):
    return normalize(pd.DataFrame(df))


def test_matching_frames_pass_any_row_order():
    a = _n({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    b = _n({"k": [3, 1, 2], "v": ["z", "x", "y"]})
    ok, msg = values_match(a, b)
    assert ok, msg


def test_value_difference_detected():
    a = _n({"k": [1, 2], "v": [10.0, 20.0]})
    b = _n({"k": [1, 2], "v": [10.0, 20.5]})
    ok, _ = values_match(a, b)
    assert not ok


def test_row_count_difference_detected():
    ok, msg = values_match(_n({"k": [1, 2]}), _n({"k": [1]}))
    assert not ok and "row count" in msg


def test_column_rename_detected():
    ok, msg = values_match(_n({"k": [1]}), _n({"kk": [1]}))
    assert not ok and "columns differ" in msg


def test_null_vs_value_detected():
    a = _n({"k": [1, 2], "v": ["x", None]})
    b = _n({"k": [1, 2], "v": ["x", "y"]})
    ok, _ = values_match(a, b)
    assert not ok


def test_float_default_is_exact_and_tolerance_is_explicit():
    # the default comparison is EXACT (mirrors the driver's value hash);
    # last-ulp drift fails unless a tolerance is explicitly requested
    a = _n({"v": [1.0]})
    assert values_match(a, _n({"v": [1.0]}))[0]
    assert not values_match(a, _n({"v": [1.0 + 1e-12]}))[0]
    assert values_match(a, _n({"v": [1.0 + 1e-12]}), float_tol=1e-9)[0]
    assert not values_match(a, _n({"v": [1.001]}), float_tol=1e-9)[0]
