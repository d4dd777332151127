"""Harness self-test: the oracle comparator must CATCH corruption.

A green sweep only means something if the checker would have gone red
on a wrong answer — so pin its sensitivity: value flips, row drops,
row additions, column renames, and sub-rounding float jitter must
each produce the verdict the methodology claims (first four caught,
the last tolerated by design)."""

import importlib.util
import sys

import pandas as pd


def _checker():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    m = importlib.util.module_from_spec(spec)
    saved = sys.argv
    sys.argv = ["check_oracle"]  # module only reads argv in main()
    try:
        spec.loader.exec_module(m)
    finally:
        sys.argv = saved
    return m


def _verdict(m, a: pd.DataFrame, b: pd.DataFrame) -> bool:
    import numpy as np

    ca, cb = m.canon(a), m.canon(b)
    ok = (
        len(ca) == len(cb)
        and list(ca.columns) == list(cb.columns)
        and ca.equals(cb)
    )
    if not ok and len(ca) == len(cb) and list(ca.columns) == list(cb.columns):
        try:
            ok = all(
                np.allclose(ca[c], cb[c], rtol=0, atol=1e-9)
                if pd.api.types.is_float_dtype(ca[c])
                else (ca[c] == cb[c]).all()
                for c in ca.columns
            )
        except Exception:
            ok = False
    return ok


BASE = pd.DataFrame(
    {"k": ["a", "b", "c"], "n": [1, 2, 3], "x": [1.5, 2.5, 3.5]}
)


def test_identical_and_reordered_pass():
    m = _checker()
    assert _verdict(m, BASE, BASE.copy())
    shuffled = BASE.iloc[[2, 0, 1]].reset_index(drop=True)
    assert _verdict(m, BASE, shuffled)  # order-insensitive by design
    recol = BASE[["x", "k", "n"]]
    assert _verdict(m, BASE, recol)  # column order canonicalized


def test_value_flip_caught():
    m = _checker()
    bad = BASE.copy()
    bad.loc[1, "n"] = 99
    assert not _verdict(m, BASE, bad)
    badf = BASE.copy()
    badf.loc[0, "x"] = 1.5000001  # 1e-7 off: above atol, and
    # rtol is pinned to 0 so relative slack cannot mask it
    assert not _verdict(m, BASE, badf)


def test_row_drop_and_add_caught():
    m = _checker()
    assert not _verdict(m, BASE, BASE.iloc[:2])
    extra = pd.concat(
        [BASE, pd.DataFrame({"k": ["d"], "n": [4], "x": [4.5]})],
        ignore_index=True,
    )
    assert not _verdict(m, BASE, extra)


def test_column_rename_caught():
    m = _checker()
    renamed = BASE.rename(columns={"n": "count"})
    assert not _verdict(m, BASE, renamed)


def test_subrounding_jitter_tolerated():
    m = _checker()
    jit = BASE.copy()
    jit["x"] = jit["x"] + 1e-12  # below the 1e-9 design tolerance
    assert _verdict(m, BASE, jit)
