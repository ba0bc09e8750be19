"""Local mimic of the driver's oracle comparison: row-count + schema
(column names) + order-insensitive exact value comparison.

Stricter than tolerance-based float compare on purpose: the engine's
determinism strategy (decimal-routed sums) should make Spark and
DuckDB agree bit-for-bit; any drift is a bug to fix, not to tolerate.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd


def pooled_spark_frames(
    suite, spark, sf_dir: str, names, max_workers: int = 8
) -> dict:
    """Compute every named query's Spark result concurrently and return
    ``{name: (pandas_df | None, exception | None)}``.

    Spark's scheduler happily runs independent jobs at once (guide
    §2.6): actions are only sequential because driver code calls them
    sequentially. The 300+ per-query oracle sweeps were wall-time-bound
    on exactly that serialization — each query is ~1 s of driver-side
    analysis + a few tiny stages at test scale, so 8 in flight overlap
    almost perfectly. Assertions stay in the individual tests (same
    test ids, same failure attribution); only the Spark compute is
    hoisted. Exceptions are captured per query and re-raised by the
    owning test so ``-x`` semantics and failure messages are unchanged.

    DuckDB oracle execution is deliberately NOT pooled: a DuckDB
    connection is not safe for concurrent cursor use, and the oracle
    side is a negligible share of the wall time.
    """
    def run(name):
        try:
            return name, suite[name].spark(spark, sf_dir).toPandas(), None
        except Exception as exc:  # noqa: BLE001 - re-raised in the test
            return name, None, exc

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return {name: (df, exc) for name, df, exc in pool.map(run, names)}


def selected_param_names(request, test_func_name: str, fallback) -> list:
    """The ``name`` params of the collected (i.e. selected) tests for
    one parametrized test function — so a targeted run (``-k``, a
    single test id, a bisect) precomputes only the queries it will
    actually assert on, while a full run still precomputes everything.
    Falls back to ``fallback`` if collection introspection ever comes
    back empty (never the case under normal pytest, but a silent
    no-op fixture would fail every test with a confusing KeyError)."""
    names = sorted(
        {
            item.callspec.params["name"]
            for item in request.session.items
            if getattr(item, "originalname", item.name) == test_func_name
            and getattr(item, "callspec", None) is not None
            and "name" in item.callspec.params
        }
    )
    return names or sorted(fallback)


def _norm_cell(v):
    """Exact, structure-preserving normal form for object cells.

    NOT repr(): numpy's repr truncates arrays beyond 1000 elements
    with '...' and prints floats at ~8 significant digits, so two
    genuinely different arrays could compare equal (masking real
    drift in the middle of a long posting list or a 9th-significant-
    digit float difference), while an ndarray and an equal plain list
    compared unequal. Tuples of Python scalars compare exactly
    element-by-element instead."""
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and v != v:
        return "NaN"  # nested NaN must compare equal to nested NaN
    return v


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif s.dtype == object:
            out[c] = s.map(
                lambda v: v if isinstance(v, str) else _norm_cell(v),
                na_action="ignore",
            )
    return out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a dtype to the kind the driver's hash is sensitive to.

    Calibrated against the driver (round 2): int32-vs-int64 and
    datetime ns-vs-us are tolerated; integer-vs-floating is NOT
    (DuckDB SUM(BIGINT)→HUGEINT→pandas float64 vs Spark int64 broke
    kpi_stats / event_sessions / json_event_props in r01+r02 even
    though every value matched).
    """
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "integer"
    if pd.api.types.is_float_dtype(s):
        return "floating"
    return "other"


def assert_dtype_kinds_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str
):
    """Fail when Spark and the oracle disagree on a column's numeric
    kind — BEFORE canonicalize() coerces each side independently and
    masks exactly the drift the driver's type-sensitive hash rejects."""
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    bad = []
    for c in sorted(spark_pdf.columns):
        ks, ko = _dtype_kind(spark_pdf[c]), _dtype_kind(oracle_pdf[c])
        if ks != ko:
            bad.append(
                f"{c}: spark {spark_pdf[c].dtype} ({ks}) vs oracle "
                f"{oracle_pdf[c].dtype} ({ko})"
            )
    assert not bad, (
        f"{name}: dtype-kind drift (driver hash WILL fail): " + "; ".join(bad)
    )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert_dtype_kinds_match(spark_pdf, oracle_pdf, name)
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            mismatch = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        else:
            mismatch = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        if mismatch.any():
            i = int(np.argmax(mismatch))
            raise AssertionError(
                f"{name}: column {c!r} differs at sorted-row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r} "
                f"({int(mismatch.sum())}/{len(av)} rows differ)"
            )
