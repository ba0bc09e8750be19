"""Isotonic regression (pool-adjacent-violators) — per-group monotone
calibration.

The calibration op of ML pipelines: given noisy (x, y) observations
where y SHOULD be non-decreasing in x (model score → observed accuracy,
quality logit → keep-rate), fit the least-squares monotone step
function. PAV is inherently sequential within a group (each violation
merge can cascade arbitrarily far back), so it is NOT expressible as a
window/aggregate plan — this is exactly the sanctioned
``applyInPandas`` boundary (SURVEY §2.10): per-group state, Arrow
batch transfer, group-bounded memory.

Scale: one shuffle on the group key; each group's fit is O(n) after
the in-group sort. Groups must fit in executor memory — true for
calibration curves (points per group = score buckets or documents per
source), not for unbounded streams; pre-bucket x first if a group can
exceed memory (the quality_logit_deciles pattern).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pav(ys: list[float], ws: list[float] | None = None) -> list[float]:
    """Weighted pool-adjacent-violators, pure Python — the in-group
    kernel AND the test reference. Returns the non-decreasing fit
    minimizing Σ w·(y − ŷ)²."""
    if ws is None:
        ws = [1.0] * len(ys)
    # blocks of (weighted sum, weight, count)
    blocks: list[list[float]] = []
    for y, w in zip(ys, ws):
        blocks.append([y * w, w, 1])
        # merge while the mean of the last block violates monotonicity
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            s, w2, c = blocks.pop()
            blocks[-1][0] += s
            blocks[-1][1] += w2
            blocks[-1][2] += c
    out: list[float] = []
    for s, w2, c in blocks:
        out.extend([s / w2] * c)
    return out


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group isotonic fit of ``y_col`` over ``x_col`` ordering
    (ties broken on ``tiebreak_col`` so the fit is deterministic).
    Returns (group, x, y, y_hat) rows."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, tiebreak_col], kind="mergesort")
        pdf = pdf.reset_index(drop=True)
        pdf["y_hat"] = pav([float(v) for v in pdf[y_col]])
        return pdf[[group_col, x_col, y_col, "y_hat"]]

    # carry the INPUT types through (a hardcoded `long` would silently
    # truncate fractional x/y); y_hat is always the double PAV mean
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields[c] for c in (group_col, x_col, y_col)]
        + [StructField("y_hat", DoubleType())]
    )
    return df.groupBy(group_col).applyInPandas(fit, schema=out_schema)
