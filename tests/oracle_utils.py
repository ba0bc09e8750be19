"""Local mimic of the driver's oracle comparison: row-count + schema
(column names) + order-insensitive exact value comparison.

Stricter than tolerance-based float compare on purpose: the engine's
determinism strategy (decimal-routed sums) should make Spark and
DuckDB agree bit-for-bit; any drift is a bug to fix, not to tolerate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


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
            # decimal.Decimal or lists → stable string form
            out[c] = s.map(lambda v: repr(v) if not isinstance(v, str) else v,
                           na_action="ignore")
    return out.sort_values(by=list(out.columns), na_position="last").reset_index(
        drop=True
    )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
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
