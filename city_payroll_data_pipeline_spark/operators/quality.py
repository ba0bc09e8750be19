"""Data-quality operators: table profiling and declarative rule checks.

Both are single-pass wide aggregations — at 100 TB the only acceptable
shape for profiling is ONE scan computing every statistic, never a
per-column loop of jobs (N columns must not mean N scans). Rule checks
compile to conditional counts in the same pass, so a quality gate adds
zero extra reads to the pipeline it guards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str], exact_distinct: bool = False
) -> DataFrame:
    """One-row profile: per column — null count, distinct count, min,
    max (min/max as strings so numeric and string columns coexist in
    the fixed output schema). Distinct defaults to HLL
    (approx_count_distinct): profiling is an observability pass, and
    the sketch keeps it one streaming aggregation with bounded memory
    per column; ``exact_distinct=True`` is the audit/oracle mode."""
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs: list[Column] = [F.count("*").alias("n_rows")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count_if(col.isNull()).alias(f"nulls_{c}"),
            distinct(c).alias(f"distinct_{c}"),
            F.min(col).cast("string").alias(f"min_{c}"),
            F.max(col).cast("string").alias(f"max_{c}"),
        ]
    return df.agg(*aggs)


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Declarative quality gate: ``rules`` maps rule name → a Column
    predicate that should hold for every row. Returns one row per rule
    (rule, n_violations, n_rows, pass_rate) computed in a single scan —
    the violation counts are conditional aggregates, then unpivoted.

    A row VIOLATES a rule unless the predicate is literally TRUE:
    NULL counts as a violation (``count_if(~cond)`` alone would skip
    NULL evaluations — and NULLs are the most common bad value a
    quality gate exists to catch).

    Deterministic: counts are exact integers; pass_rate is one double
    division rounded to 6."""
    viol_aggs = [
        F.count_if(~F.coalesce(cond, F.lit(False))).alias(f"_v_{name}")
        for name, cond in rules.items()
    ]
    wide = df.agg(F.count("*").alias("_n"), *viol_aggs)
    per_rule = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"_v_{name}").alias("n_violations"),
                )
                for name in rules
            ]
        )
    ).alias("r")
    return wide.select(per_rule, F.col("_n").alias("n_rows")).select(
        "r.rule",
        "r.n_violations",
        "n_rows",
        F.round(
            (F.col("n_rows") - F.col("r.n_violations"))
            / F.col("n_rows").cast("double"),
            6,
        ).alias("pass_rate"),
    )


def quarantine(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Row-level quality routing: tag every row with the list of rules
    it violates (``quarantine_reasons``, rule-declaration order) and a
    ``is_quarantined`` flag. The caller splits on the flag — good rows
    flow on, quarantined rows land in a side table with machine-
    readable reasons for reprocessing, which is the production shape:
    a gate that silently DROPS rows destroys the audit trail, and one
    that only counts violations (:func:`check_rules`) can't route.

    Pure narrow projection — the reason array is a compact of
    per-rule CASE tags, codegen'd into the scan; zero shuffles, and
    splitting pass/fail downstream reuses one cached scan."""
    # NULL predicate = violation (same contract as check_rules): a
    # bare ``when(~cond, ...)`` yields NULL for NULL evaluations,
    # array_compact would drop the tag, and the row would flow on as
    # clean with no audit trail.
    reasons = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    return df.withColumn("quarantine_reasons", reasons).withColumn(
        "is_quarantined", F.size("quarantine_reasons") > 0
    )


def observed(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, "Observation"]:
    """Attach in-flight metrics to a plan via the Observation API:
    the metrics are accumulated DURING whatever action consumes the
    returned frame — row counts, null counts, sums come for free with
    the write, no second scan. At 100 TB a separate metrics pass costs
    as much as the job itself; this costs nothing.

        out, obs = observed(fct, "ingest", {"rows": F.count(F.lit(1)),
                                            "null_pay": F.count_if(F.col("total_amount").isNull())})
        out.write.parquet(...)
        obs.get  # -> {'rows': ..., 'null_pay': ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs
