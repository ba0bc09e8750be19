"""Heavy hitters (frequent items) with the two-pass sketch shape.

The naive way to find tokens above an ε share of a corpus is a full
``groupBy(token)`` — a vocabulary-wide shuffle where 99.9 % of the
keys are long-tail singletons that can never qualify. The scalable
shape is candidate-generation + exact recheck:

1. **Local pass (no shuffle):** inside each partition, count tokens
   and emit only those with local share ≥ ε. Pigeonhole guarantee: if
   freq(x) > ε·N globally then Σ_p local_p(x) > ε·Σ_p n_p, so some
   partition has local share > ε — a true heavy hitter can NEVER be
   missed, no matter how its occurrences are distributed. (Same
   guarantee family as Misra-Gries/SpaceSaving; this variant trades a
   slightly looser candidate bound for a trivially mergeable stateless
   pass.)
2. **Exact recheck (candidate-sized shuffle):** re-count ONLY the
   candidates (broadcast semi-join probe) and keep those above the
   global threshold.

The candidate SET depends on partitioning (more partitions → more
false candidates), but the final output is partitioning-independent:
exactly the tokens with global count > ε·N — which is why the suite
oracle is the plain exact SQL with no sketch at all.

The local pass is a Pandas ``mapInPandas`` operator — one of the
sanctioned Python boundaries (SURVEY §2.10): per-partition stateful
counting is exactly what built-in DataFrame ops cannot express
without the vocabulary-wide shuffle this operator exists to avoid.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _eps_ratio(epsilon: float) -> Fraction:
    """ε as an exact rational (0.002 → 1/500) so every threshold gate
    is a cross-multiplied INTEGER comparison. A float gate (`cnt >
    ε·N`) can flip either way on a count landing exactly on ε·N —
    and DuckDB parses the same literal as exact DECIMAL, so the two
    engines could disagree on the boundary row (house convention:
    seasonal_anomalies and friends cross-multiply too)."""
    return Fraction(str(epsilon))


def local_heavy_hitter_candidates(
    tokens: DataFrame, token_col: str, epsilon: float
) -> DataFrame:
    """Tokens whose share WITHIN their partition is ≥ epsilon — a
    superset of the global-ε heavy hitters (pigeonhole), produced with
    zero shuffle: Arrow batches stream through a per-partition Counter
    whose size is bounded by the partition's distinct-token count (at
    most 1/ε survivors are emitted)."""

    num, den = (r := _eps_ratio(epsilon)).numerator, r.denominator

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        total = 0
        for pdf in batches:
            col = pdf[token_col]
            counts.update(col.tolist())
            total += len(col)
        if total:
            # integer gate: c/total ≥ num/den ⟺ c·den ≥ num·total —
            # float rounding must not drop a boundary candidate or the
            # pigeonhole superset guarantee breaks
            out = [t for t, c in counts.items() if c * den >= num * total]
            yield pd.DataFrame({token_col: out})

    # output schema mirrors the input column's type — a hardcoded
    # 'string' would crash the Arrow serializer on bigint/int keys,
    # and the contract is any groupable key
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField(token_col, tokens.schema[token_col].dataType)])
    return tokens.mapInPandas(per_partition, schema=schema)


def heavy_hitters(
    tokens: DataFrame, token_col: str, epsilon: float
) -> DataFrame:
    """Exact frequent-item table: every token with global count >
    ε·total, with its exact count and share. Output is independent of
    partitioning (candidates are a guaranteed superset; the recheck is
    exact)."""
    num, den = (r := _eps_ratio(epsilon)).numerator, r.denominator
    cands = local_heavy_hitter_candidates(tokens, token_col, epsilon).distinct()
    total = tokens.agg(F.count("*").alias("n_total"))
    return (
        tokens.join(F.broadcast(cands), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
        # cnt > ε·N as exact integers: cnt·den > num·N (see _eps_ratio)
        .filter(F.col("cnt") * F.lit(den) > F.lit(num) * F.col("n_total"))
        .select(
            token_col,
            "cnt",
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("share"),
        )
    )
