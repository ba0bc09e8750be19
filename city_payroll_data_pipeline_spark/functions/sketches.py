"""Shared sketch register derivations.

The HyperLogLog register coordinates are consumed by three surfaces
that must stay BIT-IDENTICAL so their registers merge: the batch
cardinality audit (suite/mlops.py::q_hll_distinct_audit), the
register-merge union/intersection audit
(suite/mlops.py::q_hll_union_intersect_audit), and the streaming
register job (streaming/jobs.py::streaming_hll_registers), whose
batch-equality test is only meaningful if all sites derive registers
from the one definition below. Any p / substring-offset change here
changes all three together — previously each site re-spelled the
expressions inline and a one-site tweak would have silently broken
cross-surface register mergeability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# p=12 -> m=4096 registers. The bucket is the first 3 md5 hex chars
# (12 bits); rho is derived from the next 12 hex chars (48-bit
# suffix). These constants are structural: changing p requires
# changing the substring splits in lockstep, which is exactly why the
# derivation lives in one place.
HLL_P = 12
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_C49 = 1 << 49


def hll_bucket_rho(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) register coordinates of ``key`` for the p=12 HLL.

    bucket = int(md5[0:3], 16) in [0, 4096); rho = 49 − bitlen(v48)
    where v48 = int(md5[3:15], 16), and rho = 49 when v48 == 0 (the
    all-zero suffix has 48 leading zeros → rank 49). bitlen via
    length(bin(v)) — no leading zeros, bin(0) = '0' — matching the
    DuckDB oracle replay's length(bin(...)) semantics exactly.
    """
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    v48 = F.conv(F.substring(h, 4, 12), 16, 10).cast("bigint")
    rho = F.when(v48 == 0, F.lit(49)).otherwise(
        F.lit(49) - F.length(F.bin(v48))
    )
    return bucket, rho


def hll_estimate(v_obs: Column, s_obs: Column) -> Column:
    """Cardinality estimate from aggregated register observations.

    ``v_obs`` = number of OCCUPIED registers, ``s_obs`` =
    Σ 2^(49 − M_j) over occupied registers (an exact BIGINT — the only
    doubles below are one division, a fixed multiply chain, and the
    8-dp-rounded ln of an integer ratio, so both engines compute the
    identical value). Applies the Flajolet linear-counting branch for
    the small range (raw ≤ 2.5 m with empty registers), matching the
    DuckDB replay in suite/mlops.py::_hll_sql and the
    suite/relational.py approx_* oracles expression-for-expression.
    """
    v_empty = F.lit(HLL_M) - v_obs
    s = s_obs + v_empty * F.lit(HLL_C49)
    raw = (
        F.lit(HLL_ALPHA)
        * HLL_M
        * HLL_M
        * (F.lit(float(HLL_C49)) / s.cast("double"))
    )
    lc = HLL_M * F.round(
        F.log(F.lit(HLL_M).cast("double") / v_empty.cast("double")), 8
    )
    return F.when((raw <= 2.5 * HLL_M) & (v_empty > 0), lc).otherwise(raw)
